"""High-level training driver (reference train.py:19-77 semantics, TPU-native).

Per epoch: resolve backbone freeze policy + LR schedule factor (as device
scalars — no recompiles), run jitted train + val epochs, compute sklearn
metrics, log locally (+Comet), save best-by-val-balanced-accuracy and last
checkpoints (full train state, Orbax) and a portable weights msgpack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from tqdm import tqdm

from nkbx.logging import TrainLogger
from nkbx.metrics import compute_metrics
from nkbx.train.checkpoint import (
    load_cursor,
    restore_train_state,
    save_checkpoint,
    save_model_msgpack,
)
from nkbx.train.engine import (
    EpochCollector,
    build_eval_step,
    build_train_step,
    train_epoch,
    val_epoch,
)
from nkbx.train.optim import backbone_state_factor, get_optimizer, get_scheduler
from nkbx.train.state import TrainState


def train(
    model,
    train_loader,
    val_loader,
    criterion,
    comet_experiment,
    local_experiment,
    cfg,
    mesh=None,
    resume_from=None,
):
    """Run the full training loop; returns the final TrainState."""
    model_path = local_experiment.path / "weights"
    n_epochs = cfg.n_epochs
    classes = train_loader.dataset.classes
    train_logger = TrainLogger(cfg, comet_experiment, local_experiment, classes)
    train_logger.log_images_at_start(train_loader)

    bundle = get_optimizer(model.params, cfg.optimizer)
    schedule = get_scheduler(cfg.lr_policy)
    # model_ema_decay > 0: maintain an EMA shadow of the params in the train
    # step; validation, best-checkpoint selection and the portable msgpacks
    # then use the EMA weights (the torch-timm ModelEmaV2 recipe)
    ema_decay = float(getattr(cfg, "model_ema_decay", 0.0) or 0.0)
    # bf16_master_weights = True (max-throughput recipe, SEMANTICS-CHANGING):
    # bf16 master params + optimizer moments — see TrainState.create
    master_dtype = (jnp.bfloat16
                    if getattr(cfg, "bf16_master_weights", False) else None)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx,
                              ema=ema_decay > 0, master_dtype=master_dtype)

    start_epoch, best_val_acc, resume_batch = 0, 0.0, 0
    if resume_from is not None:
        state, last_epoch, best_val_acc = restore_train_state(resume_from, state)
        start_epoch = last_epoch + 1
        # mid-epoch preemption cursor: continue the interrupted epoch exactly
        # where SIGTERM hit instead of replaying it (the cursor sidecar pins
        # the state step + loader geometry it was written against, so a stale
        # or mismatched cursor falls back to epoch-start replay)
        cur = load_cursor(resume_from)
        if cur is not None:
            valid = (cur.get("step") == int(jax.device_get(state.step))
                     and cur.get("epoch") == start_epoch
                     and cur.get("batch_size") == train_loader.batch_size
                     and cur.get("process_count") == jax.process_count())
            if valid:
                resume_batch = int(cur["batch"])
            else:
                import warnings

                warnings.warn(
                    f"preemption cursor at {resume_from} does not match the "
                    f"checkpoint or loader geometry ({cur}); replaying epoch "
                    f"{start_epoch} from its beginning")
        if jax.process_count() > 1:
            # the cursor sidecar is written by process 0; on a non-shared
            # filesystem other hosts would not see it — broadcast host 0's
            # decision so every host skips the SAME prefix
            from jax.experimental import multihost_utils

            resume_batch = int(multihost_utils.broadcast_one_to_all(
                jnp.asarray(resume_batch, jnp.int32)))
        if resume_batch:
            print(f"[nkbx] mid-epoch resume: epoch {start_epoch} continues "
                  f"at batch {resume_batch} (metrics for this epoch cover "
                  f"the remaining batches)")

    if mesh is None and getattr(cfg, "fsdp", False):
        raise ValueError("fsdp=True requires a mesh (e.g. mesh = {'data': 8})")
    if mesh is not None:
        if getattr(cfg, "fsdp", False):
            # ZeRO-3-style: large params AND their optimizer moments scatter
            # over the 'data' axis; XLA inserts the all-gather before each use
            # and a reduce-scatter for the gradients. Numerically equal to the
            # replicated path (tests/test_sharding.py); use when the model +
            # adam moments do not fit replicated in HBM.
            from nkbx.parallel import state_shardings

            state = jax.device_put(state, state_shardings(mesh, state, fsdp=True))
        else:
            # replicate the train state over the mesh; the batch is sharded
            # along 'data', so XLA emits the gradient all-reduce over ICI
            # automatically
            from nkbx.parallel import replicated_sharding

            state = jax.device_put(state, replicated_sharding(mesh))

    # mixup handles padded rows itself (self-pairing partner selection in
    # nkbx.train.mixup), so no drop_last restriction is needed
    mixup_cfg = getattr(cfg, "mixup", None)
    augment_train = train_loader.pipeline.device_apply if train_loader.pipeline else None
    augment_val = val_loader.pipeline.device_apply if val_loader.pipeline else None
    train_step = build_train_step(
        model, criterion, bundle, augment_fn=augment_train,
        log_gradients=getattr(cfg, "log_gradients", False),
        # padded final batches must not contaminate BN batch statistics
        masked_bn=(not train_loader.drop_last) and bool(model.batch_stats),
        # steps_per_dispatch > 1: lax.scan K train steps per device dispatch
        # (amortizes the per-dispatch host round trip on remote-hosted TPUs)
        scan_steps=int(getattr(cfg, "steps_per_dispatch", 1) or 1),
        # grad_accum_steps > 1: split each batch into A sequential microbatches,
        # ONE optimizer update (activation memory scales with B/A)
        grad_accum_steps=int(getattr(cfg, "grad_accum_steps", 1) or 1),
        ema_decay=ema_decay,
        mixup=mixup_cfg,
        # freeze_semantics = "torch": frozen backbone keeps stale Adam moments
        # exactly as torch does (default "decay" zeroes grads into the moments)
        freeze_semantics=getattr(cfg, "freeze_semantics", "decay"),
    )
    eval_step = build_eval_step(model, criterion, augment_fn=augment_val)

    key = jax.random.PRNGKey(getattr(cfg, "seed", 0))
    freeze_scale = 1.0
    task = cfg.task
    policy = getattr(cfg, "backbone_state_policy", {}) or {}

    for epoch in tqdm(range(start_epoch, n_epochs), desc="Training epochs"):
        freeze_scale = backbone_state_factor(policy, epoch, prev=freeze_scale)
        lr_factor = schedule(epoch)

        # metrics_accumulation: "exact" (per-sample, reference-bit-compatible)
        # or "bounded" (O(C^2) device-side folding for ImageNet-scale epochs)
        metrics_mode = getattr(cfg, "metrics_accumulation", "exact")
        state, train_results = train_epoch(
            state, train_loader, train_step, epoch, key,
            lr_factor, freeze_scale,
            epoch_logger=EpochCollector(task, metrics_mode), mesh=mesh, cfg=cfg,
            start_batch=resume_batch if epoch == start_epoch else 0,
        )
        if train_results.get("preempted"):
            # SIGTERM mid-epoch (nkbx/train/preempt.py — multi-host breaks
            # at an OR-agreed batch index, so every host is here together):
            # save the FULL train state plus a batch cursor so --resume
            # continues THIS epoch exactly where the signal hit, then stop
            # cleanly inside the grace window (skip val/metrics — the epoch
            # is partial)
            save_checkpoint(
                model_path / "last", state, epoch - 1, best_val_acc,
                cursor={
                    "epoch": epoch,
                    "batch": int(train_results["consumed_batches"]),
                    "step": int(jax.device_get(state.step)),
                    "batch_size": train_loader.batch_size,
                    "process_count": jax.process_count(),
                })
            if jax.process_index() == 0:
                save_model_msgpack(model_path / "last.msgpack", {
                    "params": state.ema_params if ema_decay > 0 else state.params,
                    "batch_stats": (state.ema_batch_stats if ema_decay > 0
                                    else state.batch_stats),
                })
            print(f"[nkbx] preemption signal received during epoch {epoch}: "
                  f"full train state saved; resume with "
                  f"--resume {model_path / 'last'}")
            break
        eval_state = (state.replace(params=state.ema_params,
                                    batch_stats=state.ema_batch_stats)
                      if ema_decay > 0 else state)
        val_results = val_epoch(
            eval_state, val_loader, eval_step, epoch,
            epoch_logger=EpochCollector(task, metrics_mode), mesh=mesh,
        )

        train_results["metrics"] = compute_metrics(cfg, train_results)
        val_results["metrics"] = compute_metrics(cfg, val_results)
        epoch_val_acc = val_results["metrics"]["epoch_acc"]
        if jax.process_count() > 1:
            # metrics are GLOBAL on every host (EpochCollector all-gathers the
            # per-sample arrays at epoch end), so each host computes the same
            # exact full-set balanced accuracy. The best-checkpoint decision
            # gates a cross-process Orbax collective, so keep a defensive
            # broadcast of host 0's value to rule out any float drift
            # desynchronizing the hosts.
            from jax.experimental import multihost_utils

            epoch_val_acc = float(
                multihost_utils.broadcast_one_to_all(jnp.asarray(epoch_val_acc, jnp.float32))
            )
        train_logger.log_epoch(epoch, train_results, val_results)
        if "throughput" in train_results:  # SURVEY.md §5.1 perf counters
            local_experiment.log_metric(
                "train images/sec/chip",
                train_results["throughput"]["images_per_sec_per_chip"], epoch=epoch,
            )

        if ema_decay > 0:
            variables = {"params": state.ema_params,
                         "batch_stats": state.ema_batch_stats}
        else:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        is_proc0 = jax.process_index() == 0  # plain file writes are not multi-host-coordinated
        if epoch_val_acc is not None and epoch_val_acc > best_val_acc:
            best_val_acc = epoch_val_acc
            save_checkpoint(model_path / "best", state, epoch, best_val_acc)
            if is_proc0:
                save_model_msgpack(model_path / "best.msgpack", variables)
        save_checkpoint(model_path / "last", state, epoch, best_val_acc)
        if is_proc0:
            save_model_msgpack(model_path / "last.msgpack", variables)

        from nkbx.train import preempt

        if preempt.agreed():
            # multi-host runs honor the signal at the epoch boundary (a
            # per-host mid-epoch break would desynchronize the collectives);
            # agreed() OR-reduces the per-host flags so every host takes the
            # same branch even when signal delivery straddles the check; the
            # full-epoch last checkpoint was just saved above
            print(f"[nkbx] preemption signal received: stopping after epoch "
                  f"{epoch}; resume with --resume {model_path / 'last'}")
            break

    model.variables = {
        "params": state.ema_params if ema_decay > 0 else state.params,
        "batch_stats": state.ema_batch_stats if ema_decay > 0 else state.batch_stats,
    }

    if getattr(cfg, "export_serving", False) and jax.process_index() == 0:
        # reference train.py re-scripts TorchScript every epoch (train.py:66-73);
        # nkbx exports the final serving bundle once at the end (the per-epoch
        # orbax checkpoints already cover resume/warm-start). Only process 0
        # writes: export_model's plain file write is not multi-host-coordinated.
        from nkbx.export import export_model
        from nkbx.models.classifier import ClassificationModel
        from nkbx.train.checkpoint import load_model_variables

        # export at the VAL/inference spatial size: H,W are static in the
        # exported program (only the batch dim is symbolic)
        size = val_loader._out_hw
        if size is None:
            raise ValueError(
                "export_serving requires a val pipeline with a static output "
                "size (the exported program has static H, W)"
            )
        h, w = size
        bs = val_loader.batch_size
        if (model_path / "best").is_dir():
            best_vars = load_model_variables(model_path / "best", model.variables)
            best_model = ClassificationModel(
                model.module, best_vars, model.classes, model.task, model.emb_size
            )
            export_model(best_model, (bs, h, w, 3), model_path / "best.nkbx")
        else:
            import warnings

            warnings.warn("export_serving: no best/ checkpoint in this run dir; "
                          "skipping best.nkbx")
        export_model(model, (bs, h, w, 3), model_path / "last.nkbx")

    return state
