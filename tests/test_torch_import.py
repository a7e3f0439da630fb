"""Torch-import test with a synthetic reference-layout state_dict."""

import numpy as np
import jax
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.models.torch_import import (
    build_mapping,
    import_state_dict,
)


@pytest.fixture(scope="module")
def model():
    m = build_model("resnet10.yaml", nc=13, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def synth_state_dict(model, variables):
    """Build a torch-named state_dict whose shapes match our tree by
    inverting the importer's transforms."""
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    mapping = build_mapping(model.spec)
    rng = np.random.RandomState(0)
    sd = {}
    for t_key, (coll, o_path) in mapping.items():
        tree = params if coll == "params" else stats
        node = tree
        ok = True
        for k in o_path.split("/"):
            if not isinstance(node, dict) or k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        shape = np.asarray(node).shape
        if o_path.endswith("kernel"):
            # our HWIO -> torch OIHW
            h, w_, i, o = shape
            sd[t_key] = rng.randn(o, i, h, w_).astype(np.float32)
        elif o_path.endswith("/w"):
            sd[t_key] = rng.randn(1, shape[2], 1, 1, 1).astype(np.float32)
        else:
            sd[t_key] = rng.randn(*shape).astype(np.float32)
    return sd


def test_mapping_covers_model(model):
    m, v = model
    mapping = build_mapping(m.spec)
    assert len(mapping) > 80  # res10 has many conv/bn/mem params


def test_import_round_trip(model):
    m, v = model
    sd = synth_state_dict(m, v)
    new_vars, report = import_state_dict(sd, m, v)
    assert len(report["matched"]) > 80
    assert not report["missed"], report["missed"][:5]

    # spot-check a conv kernel transpose round-trips
    k = "model.0.conv.weight"
    want = np.transpose(sd[k], (2, 3, 1, 0))
    got = np.asarray(new_vars["params"]["layers_0"]["conv"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want)

    # BN running stats land in batch_stats
    s = "model.0.bn.bn.running_mean"
    got = np.asarray(new_vars["batch_stats"]["layers_0"]["bn"]["bn"]["mean"])
    np.testing.assert_allclose(got, sd[s])


def test_imported_model_runs(model):
    import jax.numpy as jnp

    m, v = model
    sd = synth_state_dict(m, v)
    # tame synthetic BN vars (must be positive)
    for k in list(sd):
        if "running_var" in k:
            sd[k] = np.abs(sd[k]) + 0.5
    new_vars, _ = import_state_dict(sd, m, v)
    z, _ = m.apply(new_vars, jnp.zeros((1, 64, 64, 3)), training=False)
    assert bool(jnp.isfinite(z).all())
