"""Full training loop (reference train.py:73-760 / train2.py `train()`).

One driver covers all four reference trainers: the head type selects the
loss (train.py anchor / train2.py TAL / train3.py v10 / train_dual.py dual).
TPU specifics: the step is one jit-compiled function (grads + optimizer +
EMA), the batch is sharded over the data mesh, BN stats are global, and
checkpointing is orbax.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import val as val_mod
from ..data.dataset import Dataset
from ..data.hyps import HYP_SCRATCH
from ..models.yolo import build_model
from ..parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated,
    shard_params,
)
from ..parallel import multihost
from ..utils.checkpoint import save_checkpoint, strip_optimizer
from ..utils.general import LOGGER, Callbacks, EarlyStopping, increment_path
from ..utils.loggers import Loggers
from .optim import build_optimizer, make_lr_fn
from .trainer import create_train_state, make_train_step


def _head_of(cfg) -> str:
    """Last head row's block name from the model YAML ('' on failure)."""
    from ..models.yolo import load_cfg

    try:
        d = load_cfg(cfg)
        rows = list(d.get("head", []))
        return rows[-1][2] if rows else ""
    except Exception:
        return ""


def _is_segment_head(cfg) -> bool:
    """True when the model YAML's head is Segment/Panoptic (drives the
    polygon-label SegmentDataset + composite mask loss)."""
    return _head_of(cfg) in ("Segment", "Panoptic")


def train(
    cfg: str = "resnet10.yaml",
    train_path=None,
    val_path=None,
    nc: Optional[int] = None,
    hyp: Optional[Dict] = None,
    epochs: int = 300,
    batch_size: int = 8,
    imgsz: int = 640,
    optimizer: str = "SGD",
    cos_lr: bool = True,
    nbs: int = 64,
    ema_decay: float = 0.9999,
    patience: int = 100,
    save_dir: str = "runs/train/exp",
    max_labels: int = 300,
    close_mosaic: int = 0,
    val_every: int = 1,
    seed: int = 0,
    callbacks: Optional[Callbacks] = None,
    save_period: int = -1,
    multi_scale: bool = False,
    sr: float = 0.0,
    resume: Optional[str] = None,
    image_weights: bool = False,
    remat: bool = False,
    events: bool = False,
    autoanchor: bool = True,
    loggers_include=("csv", "tb"),
    workers: int = 4,
    bf16: bool = False,
    remat_neuron: bool = False,
    model_parallel: int = 1,
    quad: bool = False,
    cache: Optional[str] = None,
    device_augment: bool = False,
    steps_per_call: int = 1,
):
    """Returns (state, best_fitness, results_history).

    ``events=True`` trains from pre-voxelized event samples ([B,T,H,W,C]
    batches, reference g1-resnet/train_g1.py:213,295) — the model's 5-D
    input mode; mosaic/multi-scale/image-weights are image-space-only and
    are skipped."""
    hyp = {**HYP_SCRATCH, **(hyp or {})}
    if device_augment and (events or _is_segment_head(cfg) or quad):
        LOGGER.warning(
            "device_augment supports the plain detection pipeline only — "
            "falling back to host augmentation"
        )
        device_augment = False
    callbacks = callbacks or Callbacks()
    save_dir = increment_path(save_dir, mkdir=True)
    w = Path(save_dir) / "weights"
    w.mkdir(parents=True, exist_ok=True)

    snn_cfg = None
    if events:
        from ..config import SNNConfig
        from ..data.events import EventDataset

        train_ds = EventDataset(train_path, img_size=imgsz,
                                max_labels=max_labels)
        val_ds = (
            EventDataset(val_path, img_size=imgsz, max_labels=max_labels)
            if val_path else None
        )
        image_weights = multi_scale = False
        close_mosaic = 0
        # the time window is a property of the event stream (T=5 for Gen1,
        # reference g1-resnet/train_g1.py:488) — size the model to it
        t_data = train_ds[0][0].shape[0]
        snn_cfg = SNNConfig(time_window=t_data)
        LOGGER.info(f"event mode: T={t_data} from data")
    elif _is_segment_head(cfg):
        # instance-segmentation training: polygon labels + proto-resolution
        # masks feed the composite loss (reference utils/segment stack)
        from ..data.dataset import SegmentDataset

        train_ds = SegmentDataset(
            train_path, img_size=imgsz, augment=True, hyp=hyp,
            max_labels=max_labels,
            # Panoptic also trains the semantic branch: class-id map from
            # thing polygons + optional stuff/xxx.txt polygons (reference
            # utils/panoptic/dataloaders.py)
            semantic=_head_of(cfg) == "Panoptic",
        )
        val_ds = (
            SegmentDataset(val_path, img_size=imgsz, augment=False,
                           max_labels=max_labels, include_masks=False)
            if val_path else None
        )
        image_weights = multi_scale = False
        close_mosaic = 0
        LOGGER.info("segmentation mode: polygon labels + instance masks")
    else:
        # device_augment moves mosaic/affine/HSV/flip ONTO the accelerator
        # (data/device_augment.py, jit-compiled per batch): the host then
        # only decodes + letterboxes, which with --cache ram makes the input
        # pipeline O(memcpy) per epoch.  The reference has no equivalent —
        # all augmentation lives in DataLoader workers
        # (utils/datasets.py:553-624); this is the SURVEY §2.9 north-star
        # host-offload path.  NOTE: the host letterbox uses scaleup=False in
        # this mode (val semantics); the device affine's random scale
        # re-introduces scale jitter.
        train_ds = Dataset(
            train_path, img_size=imgsz, augment=not device_augment, hyp=hyp,
            max_labels=max_labels, cache_images=cache, uint8_out=True,
        )
        val_ds = (
            Dataset(val_path, img_size=imgsz, augment=False,
                    max_labels=max_labels, cache_images=cache,
                    uint8_out=True)
            if val_path
            else None
        )

    anchors_override = None
    if autoanchor and not events and not resume:
        # pre-train BPR gate + kmeans/GA re-fit (reference train.py:239)
        probe = build_model(cfg, nc=nc)
        if probe.head_name == "Detect":
            from ..utils.autoanchor import check_anchors

            anchors_px = np.array(probe.head["anchors_px"], np.float64)
            shapes = np.full((len(train_ds), 2), imgsz, np.float64)
            new_a, changed = check_anchors(
                train_ds.labels, shapes, anchors_px,
                thr=hyp.get("anchor_t", 4.0), imgsz=imgsz,
            )
            if changed:
                anchors_override = [
                    [float(v) for v in level] for level in
                    np.asarray(new_a).reshape(anchors_px.shape)
                ]
                LOGGER.info(f"autoanchor: new anchors {anchors_override}")

    if remat_neuron:
        from ..config import DEFAULT_SNN

        snn_cfg = (snn_cfg or DEFAULT_SNN).replace(remat_neuron=True)
    model = build_model(cfg, nc=nc, remat=remat, anchors=anchors_override,
                        snn=snn_cfg)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, imgsz=min(imgsz, 256))
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    accumulate = max(round(nbs / batch_size), 1)

    tx = build_optimizer(
        variables["params"],
        name=optimizer,
        lr0=hyp["lr0"], lrf=hyp["lrf"], momentum=hyp["momentum"],
        weight_decay=hyp["weight_decay"] * batch_size * accumulate / nbs,
        epochs=epochs, steps_per_epoch=steps_per_epoch, cos_lr=cos_lr,
        warmup_epochs=hyp["warmup_epochs"],
        warmup_momentum=hyp["warmup_momentum"],
        warmup_bias_lr=hyp["warmup_bias_lr"],
        accumulate=accumulate,
        # warmup-iteration floor differs by trainer generation: v1 anchor
        # trainer uses 1000 (train.py:452), the TAL/v10/dual generation 100
        # (train2.py:238, train3/train_dual same)
        warmup_floor=1000.0 if model.head_name == "Detect" else 100.0,
    )
    state = create_train_state(variables, tx)

    # use the largest device count that divides the batch (data-parallel).
    # Under jax.distributed (multi-host), jax.devices() spans every host and
    # the same 1-D mesh is the DDP equivalent over ICI/DCN; each host feeds
    # its slice of the global batch (parallel/multihost.py).
    devs = jax.devices()
    world = jax.process_count()
    mp = max(model_parallel, 1)
    # quad collate yields batch//4 canvases — the device batch the mesh sees
    step_batch = batch_size // 4 if quad else batch_size
    # largest device count that is a multiple of the model axis AND whose
    # data-axis extent divides the batch (data-parallel over 'data')
    n_dev = max(
        (d for d in range(1, len(devs) + 1)
         if d % mp == 0 and step_batch % (d // mp) == 0),
        default=0,
    )
    if n_dev == 0:
        raise ValueError(
            f"model_parallel={mp} needs at least {mp} devices whose "
            f"data-axis extent divides the step batch {step_batch}; "
            f"have {len(devs)} device(s)"
        )
    if world > 1 and n_dev != len(devs):
        raise ValueError(
            f"multi-host training needs batch {batch_size} divisible by "
            f"all {len(devs)} devices"
        )
    if mp > 1:
        # hybrid (data x model) mesh: weight/optimizer/EMA leaves shard
        # their output-channel dim over 'model' (parallel/mesh.shard_params,
        # ZeRO-3-style); the reference has no TP/FSDP equivalent
        mesh = make_mesh_2d(devs[:n_dev], mp)
    else:
        mesh = make_mesh(devs[:n_dev])
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)
    main = multihost.is_main()
    host_shard = (jax.process_index(), world) if world > 1 else None
    state = shard_params(mesh, state) if mp > 1 else jax.device_put(state, rep)
    seg_mode = model.head_name in ("Segment", "Panoptic") and hasattr(
        train_ds, "include_masks"
    )
    sem_mode = seg_mode and getattr(train_ds, "semantic", False)
    raw_step_fn = make_train_step(
        model, tx, hyp, ema_decay=ema_decay,
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        sr=sr, sr_total_steps=epochs * steps_per_epoch,
        accumulate=accumulate,
        with_masks=seg_mode,
        with_semantic=sem_mode,
        jit=False,
    )
    step_fn = jax.jit(raw_step_fn, donate_argnums=(0,))

    aug_fn = None
    aug_key = jax.random.PRNGKey(seed ^ 0x5EED)
    if device_augment:
        from functools import partial as _partial

        from ..data.device_augment import augment_batch

        @_partial(jax.jit, static_argnames=("mosaic_on",))
        def aug_fn(images, labels, masks, key, mosaic_on):
            if images.dtype == jnp.uint8:  # uint8 transport — see trainer
                images = images.astype(jnp.float32) / 255.0
            h = dict(hyp)
            if not mosaic_on:  # close_mosaic epochs recompile once
                h["mosaic"] = 0.0
            return augment_batch(images, labels, masks, key, h)

    multi_fn = None
    if steps_per_call > 1:
        if events or seg_mode or world > 1:
            LOGGER.warning("steps_per_call supports the single-host plain "
                           "detection pipeline only — one step per call")
            steps_per_call = 1
        else:
            # chain K optimizer steps (and the device augmentation) into ONE
            # compiled call: a lax.scan over K stacked batches.  Amortizes
            # the per-call dispatch latency — negligible on a local PCIe
            # host, DOMINANT through a remote/tunneled device link (the
            # axon measurement host pays seconds per dispatch; see
            # BASELINE.md §5 epoch benchmark).  The reference steps
            # per-batch from Python (train.py:536-583) — this is the
            # compiler-friendly TPU equivalent.
            from functools import partial as _partial2

            if device_augment:
                from ..data.device_augment import augment_batch as _ab

            @_partial2(jax.jit, static_argnames=("mosaic_on",),
                       donate_argnums=(0,))
            def multi_fn(state, images, targets, t_mask, keys, mosaic_on):
                def body(st, xs):
                    im, tg, mk, ky = xs
                    if im.dtype == jnp.uint8:
                        im = im.astype(jnp.float32) / 255.0
                    if device_augment:
                        h = dict(hyp)
                        if not mosaic_on:
                            h["mosaic"] = 0.0
                        im, tg, mk = _ab(im, tg, mk, ky, h)
                    st, met = raw_step_fn(st, im, tg, mk)
                    return st, met["items"]

                return jax.lax.scan(
                    body, state, (images, targets, t_mask, keys)
                )

    # multi-scale: per-EPOCH size buckets in /32 steps over 0.5-1.5x imgsz
    # (the reference resizes per batch, train.py:544-551; bucketing per epoch
    # bounds XLA recompiles to the bucket count while keeping the capability)
    gs = int(max(model.strides))
    if multi_scale:
        lo = (int(imgsz * 0.5) // gs) * gs
        hi = (int(imgsz * 1.5) // gs) * gs
        size_buckets = list(range(lo, hi + 1, gs))
    else:
        size_buckets = [imgsz]

    stopper = EarlyStopping(patience)
    val_jit_cache: Dict = {}  # one compiled val executable reused per epoch
    best_fitness = 0.0
    start_epoch = 0
    history = []
    loggers = Loggers(save_dir, include=loggers_include)
    # LR readback for the x/lr{0,1,2} log keys (same schedules the optimizer
    # uses, evaluated at the apply count)
    sched_kw = dict(
        lr0=hyp["lr0"], lrf=hyp["lrf"], epochs=epochs,
        steps_per_epoch=steps_per_epoch / accumulate, cos_lr=cos_lr,
        warmup_epochs=hyp["warmup_epochs"],
        warmup_bias_lr=hyp["warmup_bias_lr"],
        min_warmup_steps=100.0 / accumulate,
    )
    lr_fn_w = make_lr_fn(is_bias=False, **sched_kw)
    lr_fn_b = make_lr_fn(is_bias=True, **sched_kw)
    if resume:
        # reference `--resume` / smart_resume (train.py:876-886,
        # utils/torch_utils2.py:458): restore params/opt/EMA + epoch counters
        from ..utils.checkpoint import load_checkpoint
        from .trainer import TrainState

        tree, meta = load_checkpoint(resume, template=None)
        state = TrainState(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b).astype(a.dtype)
                if hasattr(a, "dtype") else b,
                state.opt_state, tree["opt_state"],
            ),
            ema_params=tree["ema_params"],
            step=jnp.asarray(tree["step"], jnp.int32),
        )
        state = (shard_params(mesh, state) if mp > 1
                 else jax.device_put(state, rep))
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_fitness = float(meta.get("best_fitness", 0.0))
        stopper.best_fitness = best_fitness
        stopper.best_epoch = start_epoch - 1
        LOGGER.info(f"resumed from {resume} at epoch {start_epoch}")
    LOGGER.info(
        f"training {cfg} (head {model.head_name}) for {epochs} epochs, "
        f"bs={batch_size}, imgsz={imgsz}, {len(train_ds)} images"
    )
    callbacks.run("on_train_start")

    for epoch in range(start_epoch, epochs):
        callbacks.run("on_train_epoch_start")
        if image_weights:
            # class-aware resampling (reference train.py image_weights):
            # images with rare/poorly-performing classes get sampled more
            cw = np.ones(model.nc)
            if history and history[-1].get("per_class"):
                for c, (_, _, a5, _) in history[-1]["per_class"].items():
                    cw[int(c)] = (1 - a5) ** 2
            iw = np.array(
                [
                    cw[lb[:, 0].astype(int)].sum() if len(lb) else 0.1
                    for lb in train_ds.labels
                ]
            )
            iw = iw / iw.sum()
            train_ds.indices = np.random.RandomState(seed + epoch).choice(
                train_ds.n, size=train_ds.n, p=iw
            )
        if close_mosaic and epoch == epochs - close_mosaic:
            train_ds.hyp["mosaic"] = 0.0
            LOGGER.info("closing mosaic augmentation")
        if multi_scale:
            sz = size_buckets[
                np.random.RandomState(seed + epoch).randint(len(size_buckets))
            ]
            train_ds.img_size = sz
            train_ds.mosaic_border = [-sz // 2, -sz // 2]
        t0 = time.time()
        mloss = np.zeros(3)
        nb = 0
        chunk: list = []
        n_disp = 0  # batches dispatched this epoch (keys; nb = accounted)
        pending_items: list = []
        chunk_s = None
        if multi_fn is not None and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # stacked [K, B, ...] chunks shard the BATCH axis (axis 1)
            chunk_s = NamedSharding(mesh, PartitionSpec(None, "data"))

        def _account(items_row):
            nonlocal mloss, nb
            mloss = (mloss * nb + items_row) / (nb + 1)
            nb += 1
            callbacks.run("on_train_batch_end")

        def _one_step(batch_np):
            nonlocal state, n_disp
            batch = tuple(
                multihost.to_global(data_s, np.asarray(a)) for a in batch_np
            )
            if aug_fn is not None:
                # NOTE deviation: the host path rolls mosaic per-sample with
                # p=hyp['mosaic']; the device path applies it batch-wide
                # whenever p>0 (default p=1.0 — identical there)
                batch = aug_fn(
                    *batch,
                    jax.random.fold_in(
                        aug_key, epoch * steps_per_epoch + n_disp
                    ),
                    mosaic_on=train_ds.hyp.get("mosaic", 1.0) > 0,
                )
            n_disp += 1
            state, metrics = step_fn(state, *batch)
            _account(np.asarray(metrics["items"])[:3])

        prof_chunk = os.environ.get("ECS_PROFILE_CHUNK", "0") == "1"

        def _flush_chunk():
            nonlocal state, chunk, n_disp
            if not chunk:
                return
            if len(chunk) < steps_per_call:
                # epoch tail shorter than K: per-step path (reuses the
                # single-step graphs, no extra scan compile per tail size)
                for b in chunk:
                    _one_step(b)
                chunk = []
                return
            tp0 = time.time()
            stacked = [
                np.stack([c[j] for c in chunk]) for j in range(3)
            ]
            tp1 = time.time()
            if chunk_s is not None:
                stacked = [jax.device_put(a, chunk_s) for a in stacked]
            # n_disp (batches dispatched), NOT nb (batches accounted):
            # accounting is deferred, so nb lags and would repeat keys
            keys = jax.random.split(
                jax.random.fold_in(
                    aug_key, epoch * steps_per_epoch + n_disp
                ),
                steps_per_call,
            )
            n_disp += steps_per_call
            state, items_k = multi_fn(
                state, *stacked, keys,
                mosaic_on=train_ds.hyp.get("mosaic", 1.0) > 0,
            )
            # defer the readback: jax dispatch is async, so NOT forcing
            # items here lets chunk N+1's host stack/upload overlap chunk
            # N's device execution; the pending list drains after the loop
            pending_items.append(items_k)
            if prof_chunk:
                LOGGER.info(
                    f"chunk: stack {tp1 - tp0:.2f}s "
                    f"dispatch {time.time() - tp1:.2f}s "
                    f"({steps_per_call} steps)"
                )
            chunk = []

        for batch_np in train_ds.batches(
            batch_size, shuffle=True, seed=seed + epoch,
            workers=workers, host_shard=host_shard,
            quad=quad and not events and not seg_mode,
        ):
            # 3-tuple detection batches; SegmentDataset adds gt masks
            if multi_fn is not None:
                chunk.append(batch_np)
                if len(chunk) == steps_per_call:
                    _flush_chunk()
                continue
            _one_step(batch_np)
        _flush_chunk()
        for items_k in pending_items:  # drain the deferred readbacks
            for row in np.asarray(items_k)[:, :3]:
                _account(row)

        results = dict(mp=0.0, mr=0.0, map50=0.0, map=0.0, fitness=0.0)
        # rank-0-only val, like the reference (train.py:630-641); the
        # fitness is then broadcast so every host early-stops together
        # (reference v2 broadcast, train2.py:391-394)
        if main and val_ds is not None and (epoch + 1) % val_every == 0:
            eval_vars = {
                "params": state.ema_params,
                "batch_stats": state.batch_stats,
            }
            # per-epoch val batch-shards forward+NMS over the same data
            # mesh the train step uses (single-host only: in multihost the
            # mesh spans hosts and rank-0 can't feed it alone) — without
            # this, 8-chip training idles 7 chips during every val pass
            val_mesh = mesh if (world == 1 and batch_size % n_dev == 0) \
                else None
            tv0 = time.time()
            results = val_mod.run(
                model, eval_vars, None, imgsz=imgsz,
                batch_size=batch_size, dataset=val_ds, mesh=val_mesh,
                fuse_post=True,  # forward+NMS one dispatch per batch
                chain_batches=True,  # ...and the whole pass as one scan
                jit_cache=val_jit_cache,  # compile once, reuse every epoch
            )
            if prof_chunk:
                LOGGER.info(f"val: {time.time() - tv0:.2f}s")
        fit = multihost.broadcast_scalar(results["fitness"])
        history.append(results)
        callbacks.run("on_fit_epoch_end")

        # the reference's 13 fixed log keys (utils/loggers/__init__.py:47-50)
        # fanned out to CSV/TB/W&B.  val/*_loss: our val path does not
        # accumulate losses (metrics-only), logged as 0 like reference
        # standalone val.
        applies = int(state.step) // max(accumulate, 1)
        if main:
            loggers.log_metrics(
                {
                    "train/box_loss": float(mloss[0]),
                    "train/obj_loss": float(mloss[1]),
                    "train/cls_loss": float(mloss[2]),
                    "metrics/precision": results["mp"],
                    "metrics/recall": results["mr"],
                    "metrics/mAP_0.5": results["map50"],
                    "metrics/mAP_0.5:0.95": results["map"],
                    "val/box_loss": 0.0,
                    "val/obj_loss": 0.0,
                    "val/cls_loss": 0.0,
                    "x/lr0": float(lr_fn_w(applies)),
                    "x/lr1": float(lr_fn_w(applies)),
                    "x/lr2": float(lr_fn_b(applies)),
                    "fitness": fit,
                },
                step=epoch,
            )

        tc0 = time.time()
        # one device->host fetch shared by all of this epoch's saves (best/
        # last/periodic would otherwise each re-download the full state —
        # expensive through a remote device link)
        state_h = jax.device_get(state) if main else None
        if fit >= best_fitness:
            best_fitness = fit
            if main:
                save_checkpoint(
                    w / "best", state_h, model.cfg, epoch, best_fitness
                )
        if main:
            # rank-0-only checkpointing, like the reference (train.py:657)
            save_checkpoint(w / "last", state_h, model.cfg, epoch,
                            best_fitness)
            if save_period > 0 and epoch % save_period == 0:
                save_checkpoint(
                    w / f"epoch{epoch}", state_h, model.cfg, epoch,
                    best_fitness
                )
        if prof_chunk:
            LOGGER.info(f"ckpt: {time.time() - tc0:.2f}s")
        callbacks.run("on_model_save")
        LOGGER.info(
            f"epoch {epoch}: loss={mloss.round(4).tolist()} "
            f"mAP50={results['map50']:.4f} fitness={fit:.4f} "
            f"({time.time()-t0:.1f}s)"
        )
        if stopper(epoch, fit):
            break

    if (w / "best" / "tree").exists():
        strip_optimizer(w / "best", w / "best_stripped")
    callbacks.run("on_train_end")
    loggers.close()
    return state, best_fitness, history
