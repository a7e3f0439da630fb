"""Gradient-accumulation correctness: LR schedules and EMA must advance per
optimizer APPLY, not per micro-step (ADVICE r1: with nbs=64/bs=8 the warmup
stretched from 3 to ~24 epochs)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ecs_yolo_tpu.train.optim import build_optimizer, make_lr_fn
from ecs_yolo_tpu.train.ema import ema_decay


def _run(tx, params, grads, n_micro):
    """Whole trajectory under one lax.scan: a single dispatch instead of
    n_micro host round-trips (the python-loop version segfaulted XLA CPU
    deep into full-suite runs)."""

    def body(carry, _):
        params, state = carry
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), params

    (_, _), traj = jax.jit(
        lambda p, s: jax.lax.scan(body, (p, s), None, length=n_micro)
    )(params, tx.init(params))
    traj = jax.device_get(traj)  # pytree with leading [n_micro] axis
    return [
        jax.tree_util.tree_map(lambda a: a[k], traj) for k in range(n_micro)
    ]


def test_accumulate_matches_unaccumulated_schedule():
    """acc=4 over 4x micro-steps must track acc=1 exactly (same data/epoch):
    identical params after every apply boundary."""
    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))}}
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)
    spe, acc = 40, 4  # 3 * 40 = 120 > 100 so the warmup floor is inactive

    kw = dict(name="SGD", lr0=0.01, lrf=0.01, momentum=0.9,
              weight_decay=0.0, epochs=5, cos_lr=True, warmup_epochs=3.0)
    tx1 = build_optimizer(params, steps_per_epoch=spe, accumulate=1, **kw)
    tx4 = build_optimizer(params, steps_per_epoch=spe * acc, accumulate=acc, **kw)

    n_applies = 2 * spe  # two epochs worth — crosses warmup interior + decay
    t1 = _run(tx1, params, grads, n_applies)
    t4 = _run(tx4, params, grads, n_applies * acc)

    for k in range(n_applies):
        a = t1[k]["dense"]["kernel"]
        b = t4[(k + 1) * acc - 1]["dense"]["kernel"]
        # fp32 only: MultiSteps' running grad mean reorders the arithmetic
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7,
                                   err_msg=f"apply {k}")
    # sanity: training actually moved the params (schedule not stuck at 0)
    assert np.abs(t1[-1]["dense"]["kernel"] - 1.0).max() > 1e-4


def test_warmup_window_in_apply_steps():
    """With the floor active (small spe), warmup must end after
    100/accumulate applies — i.e. 100 micro-batches, like the reference."""
    lr_acc = make_lr_fn(0.01, 0.01, epochs=10, steps_per_epoch=5,
                        warmup_epochs=3.0, min_warmup_steps=100.0 / 4)
    lr_ref = make_lr_fn(0.01, 0.01, epochs=10, steps_per_epoch=20,
                        warmup_epochs=3.0, min_warmup_steps=100.0)
    # apply k under acc=4 == micro-step 4k under acc=1; epochs align because
    # spe is scaled the same way
    for k in [0, 3, 6, 12, 24, 30]:
        np.testing.assert_allclose(
            float(lr_acc(k)), float(lr_ref(4 * k)), rtol=1e-6)


def test_ema_updates_only_on_apply_boundary():
    """make_train_step(accumulate=k): EMA must be untouched between applies
    and use the APPLY count for its decay ramp."""
    from ecs_yolo_tpu.config import SNNConfig
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

    HYP = dict(box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0,
               anchor_t=4.0, fl_gamma=0.0, label_smoothing=0.0,
               slide_ratio=0.0)
    acc = 3
    model = build_model("resnet10.yaml", snn=SNNConfig(time_window=2))
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    tx = build_optimizer(variables["params"], epochs=2, steps_per_epoch=6,
                         accumulate=acc)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, HYP, accumulate=acc)

    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    targets, mask = jnp.asarray(targets), jnp.asarray(mask)

    ema0 = jax.device_get(state.ema_params)
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]

    for micro in range(1, acc + 1):
        state, _ = step(state, ims, targets, mask)
        ema_now = jax.device_get(state.ema_params)
        if micro < acc:
            np.testing.assert_array_equal(leaf(ema_now), leaf(ema0))
        else:
            # boundary: EMA moved, with d = ema_decay(applies=1)
            p = jax.device_get(state.params)
            d = float(ema_decay(1))
            expect = leaf(ema0) * d + (1 - d) * leaf(p)
            np.testing.assert_allclose(leaf(ema_now), expect,
                                       rtol=1e-5, atol=1e-7)


def test_nonfinite_grads_skipped():
    """One NaN-grad step must not poison the params (the reference's AMP
    GradScaler drops inf/NaN steps, train.py:571-576)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ecs_yolo_tpu.train.optim import build_optimizer

    params = {"conv": {"kernel": jnp.ones((3, 3, 4, 4)),
                       "bias": jnp.zeros((4,))}}
    tx = build_optimizer(params, lr0=0.1, epochs=1, steps_per_epoch=4,
                         warmup_epochs=0.0, accumulate=1)
    st = tx.init(params)
    bad = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    up, st = tx.update(bad, st, params)
    p1 = optax.apply_updates(params, up)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(p1))
    np.testing.assert_array_equal(np.asarray(p1["conv"]["kernel"]),
                                  np.asarray(params["conv"]["kernel"]))
    # recovers: a following finite step still applies (at inner apply
    # count 0 the weight-group warmup LR is exactly 0, so the movement
    # shows on the bias group, which warms up from warmup_bias_lr)
    good = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    up, st = tx.update(good, st, p1)
    p2 = optax.apply_updates(p1, up)
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(p1))
    )
    assert moved > 0


def test_momentum_warmup_schedule():
    """SGD momentum ramps warmup_momentum -> momentum over the warmup
    window (reference train.py:538-540)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ecs_yolo_tpu.train.optim import build_optimizer

    params = {"conv": {"kernel": jnp.ones((2, 2, 2, 2)),
                       "bias": jnp.zeros((2,))}}
    tx = build_optimizer(params, lr0=0.1, epochs=2, steps_per_epoch=10,
                         warmup_epochs=1.0, accumulate=1)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    def find_momenta(tree):
        out = []

        def rec(n):
            if hasattr(n, "hyperparams"):
                hp = n.hyperparams
                if "momentum" in hp:
                    out.append(float(hp["momentum"]))
            if isinstance(n, (list, tuple)):
                for c in n:
                    rec(c)
            elif hasattr(n, "_asdict"):
                for c in n._asdict().values():
                    rec(c)
            elif isinstance(n, dict):
                for c in n.values():
                    rec(c)

        rec(tree)
        return out

    p = params
    early = None
    for i in range(12):
        up, st = tx.update(g, st, p)
        p = optax.apply_updates(p, up)
        ms = find_momenta(st)
        assert ms, "no momentum hyperparam found in opt state"
        if i == 0:
            early = ms[0]
    late = find_momenta(st)[0]
    # min_warmup_steps=100 dominates here: the ramp is 0.8 -> 0.937 over
    # 100 applies, so after 12 applies momentum has risen but not converged
    assert early < late < 0.937
    assert abs(early - 0.8) < 0.02
