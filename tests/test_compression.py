"""Sparsity training and BN-gamma pruning tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.train.sparsity import (
    bn_l1_grads,
    collect_bn_gammas,
    prune_by_bn_gamma,
    bn_gamma_sparsity,
)
from ecs_yolo_tpu.train.evolve import mutate, META
from ecs_yolo_tpu.data.hyps import HYP_SCRATCH


@pytest.fixture(scope="module")
def small_model():
    m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


class TestSparsity:
    def test_l1_grads_target_bn_only(self, small_model):
        _, v = small_model
        zeros = jax.tree_util.tree_map(jnp.zeros_like, v["params"])
        g = bn_l1_grads(zeros, v["params"], sr=0.01, epoch=0, epochs=100)
        gammas = collect_bn_gammas(g)
        assert len(gammas) > 5
        for _, grad in gammas:
            # gamma init is +thresh -> sign = +1 -> grad = srtmp
            np.testing.assert_allclose(grad, 0.01, atol=1e-6)
        # conv kernels untouched
        flat = jax.tree_util.tree_leaves_with_path(g)
        for path, leaf in flat:
            keys = "/".join(str(p.key) for p in path)
            if keys.endswith("conv/kernel"):
                assert float(jnp.abs(leaf).sum()) == 0.0

    def test_prune_zeroes_fraction(self, small_model):
        _, v = small_model
        # randomize gammas so the threshold is meaningful
        rng = np.random.RandomState(0)

        def jitter(path, leaf):
            keys = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
            if len(keys) >= 2 and keys[-2] == "bn" and keys[-1] == "scale":
                return jnp.asarray(rng.rand(*leaf.shape).astype(np.float32))
            return leaf

        v2 = dict(v)
        v2["params"] = jax.tree_util.tree_map_with_path(jitter, v["params"])
        pruned, report = prune_by_bn_gamma(v2, ratio=0.5)
        assert 0.3 < report["sparsity"] <= 0.6
        assert bn_gamma_sparsity(pruned["params"]) > 0.2

    def test_pruned_model_still_runs(self, small_model):
        m, v = small_model
        pruned, _ = prune_by_bn_gamma(v, ratio=0.3)
        x = jnp.zeros((1, 64, 64, 3))
        z, _ = m.apply(pruned, x, training=False)
        assert bool(jnp.isfinite(z).all())


class TestEvolve:
    def test_mutation_respects_bounds(self):
        hyp = {k: v for k, v in HYP_SCRATCH.items() if k in META}
        import random

        out = mutate(hyp, [], random.Random(0))
        assert out != hyp
        for k, v in out.items():
            if k in META:
                assert META[k][1] <= v <= META[k][2], k

    def test_parent_selection_uses_history(self):
        import random

        hyp = {k: v for k, v in HYP_SCRATCH.items() if k in META}
        good = dict(hyp, lr0=0.05)
        history = [(0.9, good), (0.1, hyp)]
        # over many draws, mutations should mostly descend from the fit parent
        descended = 0
        for i in range(20):
            out = mutate(hyp, history, random.Random(i))
            if abs(out["lr0"] - 0.05) < abs(out["lr0"] - hyp["lr0"]):
                descended += 1
        assert descended > 10
