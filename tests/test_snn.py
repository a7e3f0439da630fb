"""Unit tests for the spiking core against independent numpy goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn import (
    heaviside,
    lif_scan,
    ecs_lif_scan,
    lif_node_scan,
    firing_rate,
)

CFG = SNNConfig()


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_lif(x, cfg, act=False):
    """Straightforward numpy transcription of the LIF recurrence."""
    T = x.shape[0]
    mem = np.zeros_like(x[0])
    spike = np.zeros_like(x[0])
    out = np.zeros_like(x)
    for i in range(T):
        mem = mem * cfg.decay * (1.0 - spike) + x[i]
        spike = np_silu(mem) if act else (mem > cfg.thresh).astype(x.dtype)
        out[i] = spike
    return out


def np_ecs_lif(x, dw, dwb, pw, pwb, cfg, act=False):
    """Numpy golden for ECS-LIF with a dense conv implementation."""
    T, N, H, W, C = x.shape
    mem = np.zeros_like(x[0])
    spike = np.zeros_like(x[0])
    ecs = np.zeros_like(x[0])
    fecs = np.zeros_like(x[0])
    out = np.zeros_like(x)

    def spread(s):
        # depthwise 3x3 (same padding) then pointwise 1x1, both with bias
        pad = np.pad(s, ((0, 0), (1, 1), (1, 1), (0, 0)))
        d = np.zeros_like(s)
        for ky in range(3):
            for kx in range(3):
                d += pad[:, ky : ky + H, kx : kx + W, :] * dw[ky, kx, 0, :]
        d = d + dwb
        p = np.einsum("nhwc,cd->nhwd", d, pw[0, 0]) + pwb
        return p

    for i in range(T):
        mem = mem * cfg.decay * (1.0 - spike) + x[i] + fecs
        spike = np_silu(mem) if act else (mem > cfg.thresh).astype(x.dtype)
        ecs = cfg.alpha * spread(spike) + (1.0 - 1.0 / cfg.ecs_tau) * ecs
        fecs = cfg.beta * np.tanh(ecs)
        out[i] = spike
    return out


class TestHeaviside:
    def test_forward(self):
        u = jnp.array([-1.0, 0.0, 0.4999, 0.5, 0.5001, 2.0])
        s = heaviside(u, 0.5, 0.5)
        np.testing.assert_array_equal(np.asarray(s), [0, 0, 0, 0, 1, 1])

    def test_surrogate_gradient_window(self):
        # d/du heaviside = 1/(2*lens) inside |u-thresh|<lens, else 0
        g = jax.grad(lambda u: heaviside(u, 0.5, 0.5).sum())(
            jnp.array([-0.1, 0.0, 0.5, 0.9, 1.1])
        )
        np.testing.assert_allclose(np.asarray(g), [0, 0, 1.0, 1.0, 0], atol=1e-6)

    def test_custom_lens(self):
        g = jax.grad(lambda u: heaviside(u, 0.0, 0.25).sum())(jnp.array([0.1]))
        np.testing.assert_allclose(np.asarray(g), [2.0], atol=1e-6)


class TestLIF:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 2, 3, 3, 5).astype(np.float32)
        got = np.asarray(lif_scan(jnp.asarray(x), CFG))
        want = np_lif(x, CFG)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_silu_mode(self):
        rng = np.random.RandomState(1)
        x = rng.randn(4, 2, 8).astype(np.float32)
        got = np.asarray(lif_scan(jnp.asarray(x), CFG, act=True))
        want = np_lif(x, CFG, act=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_reset_gradient_is_stopped(self):
        # The reset term uses stop_grad(spike): gradient w.r.t. x through the
        # reset gate must vanish.  With all potentials far from threshold the
        # surrogate window is closed, so grads flow only through mem->x paths.
        x = jnp.full((3, 1, 4), 10.0)  # way above threshold, window closed

        def f(x):
            return lif_scan(x, CFG).sum()

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), np.zeros_like(x), atol=1e-6)

    def test_grad_flows_inside_window(self):
        x = jnp.full((2, 1, 4), 0.4)  # inside surrogate window

        def f(x):
            return lif_scan(x, CFG).sum()

        g = jax.grad(f)(x)
        assert np.abs(np.asarray(g)).sum() > 0


class TestECSLIF:
    def test_matches_numpy(self):
        rng = np.random.RandomState(2)
        T, N, H, W, C = 4, 2, 5, 5, 3
        x = rng.randn(T, N, H, W, C).astype(np.float32) * 0.7
        dw = rng.randn(3, 3, 1, C).astype(np.float32) * 0.2
        dwb = rng.randn(C).astype(np.float32) * 0.1
        pw = rng.randn(1, 1, C, C).astype(np.float32) * 0.2
        pwb = rng.randn(C).astype(np.float32) * 0.1

        def spread(s):
            d = jax.lax.conv_general_dilated(
                s,
                jnp.asarray(dw),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + dwb
            p = jax.lax.conv_general_dilated(
                d,
                jnp.asarray(pw),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pwb
            return p

        # SiLU mode: continuous output -> tight elementwise check of the
        # full recurrence (membrane, reset, ECS field, spread conv wiring).
        got = np.asarray(ecs_lif_scan(jnp.asarray(x), spread, CFG, act=True))
        want = np_ecs_lif(x, dw, dwb, pw, pwb, CFG, act=True)
        np.testing.assert_allclose(got, want, atol=5e-4)

        # Spiking mode: heaviside flips on ~1e-7 conv-order differences right
        # at the threshold, so allow a small fraction of boundary mismatches.
        got_s = np.asarray(ecs_lif_scan(jnp.asarray(x), spread, CFG))
        want_s = np_ecs_lif(x, dw, dwb, pw, pwb, CFG)
        assert np.mean(got_s != want_s) < 0.02

    def test_first_step_has_no_field(self):
        # fecs_0 == 0 -> first step must equal plain threshold of x[0]
        x = jnp.asarray(np.random.RandomState(3).randn(1, 2, 4, 4, 2)).astype(
            jnp.float32
        )

        def spread(s):
            return s * 100.0  # big field, must not affect step 0

        out = ecs_lif_scan(x, spread, CFG)
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(x[0] > CFG.thresh).astype(np.float32)
        )


class TestLIFNode:
    def test_matches_numpy(self):
        rng = np.random.RandomState(4)
        x = rng.randn(5, 2, 6).astype(np.float32)
        tau, v_th = 0.25, 0.1
        u = np.zeros_like(x[0])
        spike = np.zeros_like(x[0])
        want = np.zeros_like(x)
        for i in range(5):
            u = tau * u * (1 - spike) + x[i]
            spike = ((u - v_th) > CFG.thresh).astype(np.float32)
            want[i] = spike
        got = np.asarray(lif_node_scan(jnp.asarray(x), tau, v_th, CFG))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_firing_rate():
    s = jnp.asarray([[0.0, 1.0], [1.0, 1.0]])
    assert float(firing_rate(s)) == pytest.approx(0.75)


def test_scan_jits_and_vmaps():
    x = jnp.zeros((4, 2, 8))
    out = jax.jit(lambda x: lif_scan(x, CFG))(x)
    assert out.shape == x.shape


class TestPackedSpread:
    """Width-packed ECS spread (snn/packed_spread.py) == unpacked dw+pw.

    OFF by default (net full-model regression from pack/unpack relayouts,
    docs/DESIGN.md round-3); these tests pin the exact-math equivalence so
    packed-segment experiments can build on it.
    """

    def _run(self, packed, act):
        from ecs_yolo_tpu.nn.blocks import MemUpdate

        cfg = CFG.replace(packed_spread=packed)
        T, N, H, W, C = 4, 2, 6, 8, 16  # f = 8
        x = jnp.asarray(
            np.random.RandomState(5).randn(T, N, H, W, C), jnp.float32)
        mod = MemUpdate(act=act, snn=cfg)
        vars_ = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(vars_, x, mutable=["spike_stats"])[0] \
            if not act else mod.apply(vars_, x)
        return np.asarray(out)

    def test_silu_parity(self):
        a = self._run(packed=False, act=True)
        b = self._run(packed=True, act=True)
        np.testing.assert_allclose(a, b, atol=5e-5)

    def test_spike_parity(self):
        a = self._run(packed=False, act=False)
        b = self._run(packed=True, act=False)
        # heaviside can flip on reduction-order differences at the threshold
        assert np.mean(a != b) < 0.02

    def test_grads_flow_to_spread_params(self):
        from ecs_yolo_tpu.nn.blocks import MemUpdate

        cfg = CFG.replace(packed_spread=True)
        x = jnp.asarray(
            np.random.RandomState(6).randn(4, 1, 4, 8, 16), jnp.float32)
        mod = MemUpdate(act=True, snn=cfg)
        vars_ = mod.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(mod.apply({"params": params}, x) ** 2)

        g = jax.grad(loss)(vars_["params"])
        for name in ("spread_dw_kernel", "spread_pw_kernel",
                     "spread_dw_bias", "spread_pw_bias"):
            assert float(jnp.abs(g[name]).max()) > 0.0, name

    def test_odd_width_falls_back(self):
        from ecs_yolo_tpu.nn.blocks import MemUpdate
        from ecs_yolo_tpu.snn.packed_spread import pack_factor

        # any divisor of W that fits the lanes is usable (7*16 <= 128)...
        assert pack_factor(16, 7) == 7
        # ...but a prime W over the lane budget falls back to unpacked
        assert pack_factor(64, 9) == 1
        cfg = CFG.replace(packed_spread=True)
        x = jnp.asarray(
            np.random.RandomState(7).randn(2, 1, 5, 9, 64), jnp.float32)
        mod = MemUpdate(act=True, snn=cfg)
        vars_ = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(vars_, x)
        assert out.shape == x.shape


class TestInt8ResetGate:
    """`SNNConfig.int8_reset_gate` (snn/neuron._reset_decay): the binary
    reset gate saved as int8 must be BITWISE equal to the plain
    stop-gradient expression — forward spikes and input/param grads —
    for both LIF and ECS-LIF scans."""

    def _fwd_bwd(self, scan_call, x):
        def f(x_):
            return jnp.sum(jnp.square(scan_call(x_)))

        y = scan_call(x)
        v, g = jax.value_and_grad(f)(x)
        return np.asarray(y), float(v), np.asarray(g)

    def test_lif_bitwise(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 2, 6, 6, 8), jnp.float32)
        off = CFG.replace(int8_reset_gate=False)
        on = CFG.replace(int8_reset_gate=True)
        y0, v0, g0 = self._fwd_bwd(lambda a: lif_scan(a, off), x)
        y1, v1, g1 = self._fwd_bwd(lambda a: lif_scan(a, on), x)
        np.testing.assert_array_equal(y0, y1)
        assert v0 == v1
        np.testing.assert_array_equal(g0, g1)

    def test_ecs_lif_bitwise_through_model(self):
        # whole-graph check: resnet10 at 64px/T=2, loss+grads identical
        # and the knob changes no parameter tree (mirrors the int8 spike
        # transport model-knob test)
        from ecs_yolo_tpu.models.yolo import build_model

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        outs, trees = [], []
        for knob in (False, True):
            model = build_model(
                "resnet10.yaml", nc=2,
                snn=SNNConfig(time_window=2, int8_reset_gate=knob),
            )
            variables = model.init(jax.random.PRNGKey(0), imgsz=64)
            trees.append(jax.tree_util.tree_structure(variables["params"]))

            def fwd(p):
                out, _ = model.module.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, training=True, mutable=["batch_stats"],
                )
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(jnp.square(l)) for l in leaves)

            v, g = jax.value_and_grad(fwd)(variables["params"])
            outs.append((float(v), jax.tree_util.tree_leaves(g)))
        assert trees[0] == trees[1], "knob changed the parameter tree"
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=0)
        for a, b in zip(outs[0][1], outs[1][1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_silu_sites_keep_plain_path(self):
        # act=True (SiLU) sites have a CONTINUOUS "spike" — the int8 gate
        # would be lossy there; the dispatch must keep plain AD and the
        # outputs must match the knob-off path exactly.
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(4, 2, 6, 6, 8), jnp.float32)
        off = CFG.replace(int8_reset_gate=False)
        on = CFG.replace(int8_reset_gate=True)
        y0 = np.asarray(lif_scan(x, off, act=True))
        y1 = np.asarray(lif_scan(x, on, act=True))
        np.testing.assert_array_equal(y0, y1)
