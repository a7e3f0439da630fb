"""T-invariant stem dedup (SNNConfig.stem_dedup).

A static image is replicated T times at the model entrance (reference
models/yolo.py:247-251), so layers before the first neuron scan compute the
identical value for all T copies.  ``DetectionModel`` runs that prefix once
at T=1 and broadcasts (models/yolo._t_invariant_prefix) — must be EXACTLY
the same math with the SAME parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import (
    _t_invariant_prefix,
    build_model,
    load_cfg,
    parse_model,
)


class TestPrefix:
    @pytest.mark.parametrize("cfg", ["resnet10.yaml", "resnet34.yaml"])
    def test_ems_prefix_is_stem(self, cfg):
        d = load_cfg(cfg)
        spec, save, _, _ = parse_model(d, 3)
        # stem Conv_1 only: BasicBlock_2 starts with mem_update (T-coupled)
        assert _t_invariant_prefix(spec, save) == 1

    def test_saved_layer_breaks_prefix(self):
        rows = (
            (-1, 1, "Conv_1", (64, 7, 2)),
            (-1, 1, "Pools", (2, 2)),
            (-1, 1, "BasicBlock_2", (64, 3, 1)),
        )
        assert _t_invariant_prefix(rows, save=()) == 2
        assert _t_invariant_prefix(rows, save=(0,)) == 0
        assert _t_invariant_prefix(rows, save=(1,)) == 1

    def test_disabled_via_config(self):
        m = build_model("resnet10.yaml", nc=13, snn=SNNConfig(stem_dedup=False))
        assert m.module.tinv_prefix == 0

    def test_enabled_by_default(self):
        m = build_model("resnet10.yaml", nc=13)
        assert m.module.tinv_prefix == 1


class TestParity:
    """Dedup on/off with the SAME variables (packing off to isolate)."""

    @pytest.fixture(scope="class")
    def models(self):
        on = build_model(
            "resnet10.yaml", nc=13,
            snn=SNNConfig(stem_dedup=True, packed_c64=False),
        )
        off = build_model(
            "resnet10.yaml", nc=13,
            snn=SNNConfig(stem_dedup=False, packed_c64=False),
        )
        v = on.init(jax.random.PRNGKey(0), imgsz=32)
        return on, off, v

    def test_param_tree_identical(self, models):
        on, off, v = models
        voff = off.init(jax.random.PRNGKey(0), imgsz=32)
        kp = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        ku = jax.tree_util.tree_flatten_with_path(voff["params"])[0]
        assert [(jax.tree_util.keystr(k), x.shape) for k, x in kp] == [
            (jax.tree_util.keystr(k), x.shape) for k, x in ku
        ]

    def test_eval_forward_exact(self, models):
        on, off, v = models
        x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
        za, _ = on.module.apply(v, x, training=False)
        zb, _ = off.module.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(za), np.asarray(zb), rtol=1e-5, atol=1e-4
        )

    def test_packed_plus_dedup_eval_exact(self):
        # the production default: packed C<=64 stage AND stem dedup together
        on = build_model("resnet10.yaml", nc=13,
                         snn=SNNConfig(stem_dedup=True, packed_c64=True))
        off = build_model("resnet10.yaml", nc=13,
                          snn=SNNConfig(stem_dedup=False, packed_c64=False))
        v = on.init(jax.random.PRNGKey(0), imgsz=32)
        x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
        za, _ = on.module.apply(v, x, training=False)
        zb, _ = off.module.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(za), np.asarray(zb), rtol=1e-5, atol=1e-4
        )

    def test_train_stats_and_grads_x64(self, models):
        """BN batch stats and parameter gradients must match.

        f64 (as in tests/test_packed.py): in fp32 a ~1-ulp reassociation
        shift can flip individual spikes at the Heaviside threshold.
        """
        on, off, v32 = models
        with jax.enable_x64():
            v = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64)
                if a.dtype == jnp.float32 else a, v32
            )
            x = jnp.asarray(
                np.random.RandomState(3).rand(1, 32, 32, 3), jnp.float64
            )

            def loss(m):
                def f(params):
                    out, st = m.module.apply(
                        {"params": params, "batch_stats": v["batch_stats"]},
                        x,
                        training=True,
                        mutable=["batch_stats", "spike_stats"],
                    )
                    return (
                        sum(
                            jnp.mean(jnp.square(l))
                            for l in jax.tree_util.tree_leaves(out)
                        ),
                        st["batch_stats"],
                    )

                return jax.value_and_grad(f, has_aux=True)(v["params"])

            (la, bsa), ga = loss(on)
            (lb, bsb), gb = loss(off)
            np.testing.assert_allclose(float(la), float(lb), rtol=1e-10)
            for a, b in zip(
                jax.tree_util.tree_leaves(bsa), jax.tree_util.tree_leaves(bsb)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
                )
            for a, b in zip(
                jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
                )

    def test_event_mode_bypasses_dedup(self, models):
        # 5-D event input is genuinely T-varying: identical output with
        # dedup on and off (both route through the transpose path)
        on, off, v = models
        t = on.module.snn.time_window
        x = jnp.asarray(
            np.random.RandomState(4).rand(2, t, 32, 32, 3), jnp.float32
        )
        za, _ = on.module.apply(v, x, training=False)
        zb, _ = off.module.apply(v, x, training=False)
        np.testing.assert_array_equal(np.asarray(za), np.asarray(zb))
