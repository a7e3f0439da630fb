"""Closed-form BN training backward (nn/bn_vjp.py) vs XLA AD.

The custom VJP must be the same math as differentiating the moment-based
forward — identical values, gradients equal to AD up to float
reassociation (exact in f64), same running-stat updates, and unchanged
1-vs-N mesh invariance (it reuses the per-sample/tree reduction shape).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecs_yolo_tpu.nn.bn_vjp import bn_train_norm
from ecs_yolo_tpu.nn.blocks import _det_batch_moments


def _ad_forward(y, scale, bias, eps, f):
    """The plain (AD-differentiable) moment-based forward — what
    _DetBN/_PackedBN compute without the custom VJP."""
    dt = jnp.promote_types(y.dtype, jnp.float32)
    yf = y.astype(dt)
    c = yf.shape[-1] // f
    if f == 1:
        m, v = _det_batch_moments(yf)
    else:
        spatial = tuple(range(1, yf.ndim - 1))
        cnt = yf.size // c
        ps = jnp.sum(yf, axis=spatial)
        ps2 = jnp.sum(jnp.square(yf), axis=spatial)
        from ecs_yolo_tpu.nn.blocks import _tree_fold_sum

        m = _tree_fold_sum(ps).reshape(f, c).sum(0) / cnt
        m2 = _tree_fold_sum(ps2).reshape(f, c).sum(0) / cnt
        v = m2 - jnp.square(m)
    mt, vt = jnp.tile(m, f), jnp.tile(v, f)
    st, bt = jnp.tile(scale.astype(dt), f), jnp.tile(bias.astype(dt), f)
    return (yf - mt) * st * jax.lax.rsqrt(vt + eps) + bt, m, v


@pytest.mark.parametrize("f", [1, 2])
class TestBnVjp:
    def _data(self, f):
        rng = np.random.RandomState(0)
        c = 6
        y = jnp.asarray(rng.randn(8, 5, 4, f * c) * 2 + 0.3, jnp.float64)
        scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float64)
        bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float64)
        return y, scale, bias

    def test_forward_values_match_ad_path(self, f):
        # f64 so reassociation noise is invisible (scoped x64 — the suite
        # default stays f32)
        jax.config.update("jax_enable_x64", True)
        try:
            y, scale, bias = self._data(f)
            out_c, m_c, v_c = bn_train_norm(y, scale, bias, 1e-5, f)
            out_a, m_a, v_a = _ad_forward(y, scale, bias, 1e-5, f)
            np.testing.assert_allclose(out_c, out_a, rtol=1e-12)
            np.testing.assert_allclose(m_c, m_a, rtol=1e-12)
            np.testing.assert_allclose(v_c, v_a, rtol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_gradients_match_ad(self, f):
        jax.config.update("jax_enable_x64", True)
        try:
            y, scale, bias = self._data(f)

            def loss_custom(y, s, b):
                out, _, _ = bn_train_norm(y, s, b, 1e-5, f)
                return jnp.sum(jnp.sin(out * 0.7))

            def loss_ad(y, s, b):
                out, _, _ = _ad_forward(y, s, b, 1e-5, f)
                return jnp.sum(jnp.sin(out * 0.7))

            gc = jax.grad(loss_custom, argnums=(0, 1, 2))(y, scale, bias)
            ga = jax.grad(loss_ad, argnums=(0, 1, 2))(y, scale, bias)
            for c, a, name in zip(gc, ga, ("dy", "dscale", "dbias")):
                np.testing.assert_allclose(
                    c, a, rtol=1e-9, atol=1e-12, err_msg=name
                )
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_bf16_edges_stay_bf16(self, f):
        """The custom path's dx must come back in the activation dtype."""
        y, scale, bias = self._data(f)
        y16 = y.astype(jnp.bfloat16)
        s32, b32 = scale.astype(jnp.float32), bias.astype(jnp.float32)

        def loss(y):
            out, _, _ = bn_train_norm(y, s32, b32, 1e-5, f)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        dy = jax.grad(loss)(y16)
        assert dy.dtype == jnp.bfloat16


class TestBnVjpInModel:
    def _one_step(self, knob, device_put_fn=None):
        from ecs_yolo_tpu.config import SNNConfig
        from ecs_yolo_tpu.models.yolo import build_model
        from ecs_yolo_tpu.train.optim import build_optimizer
        from ecs_yolo_tpu.train.trainer import (
            create_train_state,
            make_train_step,
        )

        hyp = dict(
            box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
            fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
        )
        model = build_model(
            "resnet10.yaml", nc=2,
            snn=SNNConfig(time_window=2, bn_custom_vjp=knob),
        )
        variables = model.init(jax.random.PRNGKey(0), imgsz=64)
        tx = build_optimizer(variables["params"], name="SGD", epochs=3,
                             steps_per_epoch=10)
        state = create_train_state(variables, tx)
        rng = np.random.RandomState(3)
        images = rng.rand(8, 64, 64, 3).astype(np.float32)
        targets = np.zeros((8, 8, 5), np.float32)
        targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.3]
        mask = np.zeros((8, 8), bool)
        mask[:, 0] = True
        if device_put_fn is not None:
            state, images, targets, mask = device_put_fn(
                state, images, targets, mask
            )
        step = make_train_step(model, tx, hyp)
        new_state, metrics = step(state, jnp.asarray(images),
                                  jnp.asarray(targets), jnp.asarray(mask))
        return new_state, metrics

    def test_train_step_knob_equivalence(self):
        """One optimizer step with bn_custom_vjp on/off agrees to float
        reassociation tolerance on the full production model (both packed
        and unpacked BN sites are on the resnet10 path)."""
        _, m_off = self._one_step(False)
        _, m_on = self._one_step(True)
        assert np.isfinite(float(m_on["loss"]))
        np.testing.assert_allclose(
            float(m_on["loss"]), float(m_off["loss"]), rtol=5e-5
        )

    def test_mesh_parity_with_custom_vjp(self):
        """The round-4 1-vs-N guarantee must hold with the knob ON: the
        custom backward's reductions keep the per-sample/tree shape."""
        from ecs_yolo_tpu.parallel.mesh import (
            make_mesh,
            replicate_tree,
            shard_batch,
        )

        assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
        d0 = jax.devices()[0]
        _, m1 = self._one_step(
            True,
            lambda s, i, t, k: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, d0), (s, i, t, k)),
        )
        mesh = make_mesh(jax.devices()[:8])
        with mesh:
            _, m8 = self._one_step(
                True,
                lambda s, i, t, k: (
                    replicate_tree(mesh, s),
                    *shard_batch(mesh, (i, t, k)),
                ),
            )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-5, atol=1e-6
        )
