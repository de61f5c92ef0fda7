"""
Sharded training utilities.

The reference ships no trainer (SURVEY.md §0/§2.8); this module is the
TPU-native training layer the rebuild adds: a pjit-compatible train-step
factory over the ("data", "model") mesh with dp batch sharding, optional tp
parameter sharding, bf16 compute with fp32 params/optimizer state, and the
DUSt3R confidence-weighted regression loss.

Checkpoint save/restore uses Orbax over the nnx state pytree.
"""

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from uniception_tpu.parallel.mesh import (
    fsdp_shard_state,
    make_mesh,
    replicate_state,
    shard_batch,
    tp_shard_state,
    zero1_shard_state,
)

__all__ = [
    "dust3r_confidence_loss",
    "flow_confidence_loss",
    "multiview_confidence_loss",
    "normalize_pointmaps",
    "normalize_pointmaps_nview",
    "make_train_step",
    "TrainContext",
    "save_train_state",
    "restore_train_state",
    "ema_init",
    "ema_update",
    "PreemptionGuard",
]


def normalize_pointmaps_nview(pts, valids=None, eps=1e-8):
    """Joint avg-distance normalization over N views (the N-view
    generalization of DUSt3R's ``norm_mode='avg_dis'``): divide every view
    by the per-batch-element mean distance-to-origin over (valid) pixels of
    ALL views. Pure reductions — static shapes, jit/pjit-safe.

    pts: list of (B, H, W, 3). Returns (list of pts/s, s) with s (B,1,1,1).
    """
    num = 0.0
    den = 0.0
    for i, p in enumerate(pts):
        if valids is not None and valids[i] is not None:
            # mask BEFORE the norm: a NaN/inf sentinel at an invalid pixel
            # would otherwise poison the scale (NaN * 0 = NaN)
            p = jnp.where(valids[i][..., None], p, 0.0)
        d = jnp.linalg.norm(p, axis=-1)
        v = jnp.ones_like(d) if valids is None or valids[i] is None else valids[i].astype(d.dtype)
        num = num + jnp.sum(d * v, axis=(1, 2))
        den = den + jnp.sum(v, axis=(1, 2))
    scale = jnp.maximum(num / jnp.maximum(den, 1.0), eps)[:, None, None, None]
    return [p / scale for p in pts], scale


def normalize_pointmaps(p1, p2, valid1=None, valid2=None, eps=1e-8):
    """Joint avg-distance normalization over a two-view pointmap pair
    (DUSt3R's published ``norm_mode='avg_dis'``): divide both views by the
    per-batch-element mean distance-to-origin over (valid) pixels of BOTH
    views. Pure reductions — static shapes, jit/pjit-safe.

    p1, p2: (B, H, W, 3). Returns (p1/s, p2/s, s) with s (B, 1, 1, 1).
    """
    (n1, n2), scale = normalize_pointmaps_nview([p1, p2], [valid1, valid2], eps=eps)
    return n1, n2, scale


def dust3r_confidence_loss(
    res1, res2, target1, target2, alpha: float = 0.2, valid1=None, valid2=None, norm_mode: Optional[str] = None
):
    """DUSt3R-style confidence-weighted pointmap regression loss.

    L = mean(conf * ||pts - gt|| - alpha * log conf), per view, masked by
    validity when provided. targets are (B, H, W, 3) pointmaps.

    norm_mode="avg_dis": DUSt3R's scale-invariant training objective —
    predictions and ground truth are each normalized by their OWN joint
    (both-views) mean distance before the regression, so the model is not
    penalized for global scale (monocular scale is unobservable). The
    reference ships no trainer (SURVEY.md §0); this follows the public
    DUSt3R recipe. Default None = raw metric regression (unchanged).
    """
    pts1, pts2 = res1["pts3d"], res2["pts3d_in_other_view"]
    if norm_mode is not None:
        if norm_mode != "avg_dis":
            raise ValueError(f"unknown norm_mode: {norm_mode!r} (supported: 'avg_dis')")
        pts1, pts2, _ = normalize_pointmaps(pts1, pts2, valid1, valid2)
        target1, target2, _ = normalize_pointmaps(target1, target2, valid1, valid2)

    def view_loss(res, pts, target, valid):
        conf = res["conf"][..., 0]
        diff = pts - target
        if valid is not None:
            # double-where: masking per_px alone is NOT enough — a NaN/inf
            # sentinel at an invalid target pixel poisons the backward
            # (where's VJP sends 0 * NaN = NaN through norm's grad)
            diff = jnp.where(valid[..., None], diff, 0.0)
        err = jnp.linalg.norm(diff, axis=-1)
        per_px = conf * err - alpha * jnp.log(conf)
        if valid is not None:
            per_px = jnp.where(valid, per_px, 0.0)
            return jnp.sum(per_px) / jnp.maximum(jnp.sum(valid), 1)
        return jnp.mean(per_px)

    return view_loss(res1, pts1, target1, valid1) + view_loss(res2, pts2, target2, valid2)


def multiview_confidence_loss(results, targets, alpha: float = 0.2, valids=None, norm_mode: Optional[str] = None):
    """N-view confidence-weighted pointmap loss (VGGT-style training over
    ``factory/multiview.py`` outputs) — the N-view generalization of
    :func:`dust3r_confidence_loss` (summed over views, matching its 2-view
    semantics).

    results: list of per-view dicts with ``pts3d`` (B,H,W,3) and ``conf``
    (B,H,W,1); targets: list of (B,H,W,3); valids: optional list of
    (B,H,W) masks. ``norm_mode="avg_dis"``: predictions and ground truth
    are each normalized by their own joint ALL-views mean distance.
    """
    pts = [r["pts3d"] for r in results]
    if norm_mode is not None:
        if norm_mode != "avg_dis":
            raise ValueError(f"unknown norm_mode: {norm_mode!r} (supported: 'avg_dis')")
        pts, _ = normalize_pointmaps_nview(pts, valids)
        targets, _ = normalize_pointmaps_nview(list(targets), valids)

    total = 0.0
    for i, r in enumerate(results):
        conf = r["conf"][..., 0]
        valid = None if valids is None else valids[i]
        diff = pts[i] - targets[i]
        if valid is not None:
            # double-where (see dust3r_confidence_loss): mask the diff so
            # NaN/inf target sentinels can't poison the backward
            diff = jnp.where(valid[..., None], diff, 0.0)
        err = jnp.linalg.norm(diff, axis=-1)
        per_px = conf * err - alpha * jnp.log(conf)
        if valid is not None:
            per_px = jnp.where(valid, per_px, 0.0)
            total = total + jnp.sum(per_px) / jnp.maximum(jnp.sum(valid), 1)
        else:
            total = total + jnp.mean(per_px)
    return total


def flow_confidence_loss(out, target_flow, alpha: float = 0.2, valid=None):
    """Confidence-weighted dense-flow regression loss for ``UFMFlow``
    outputs — the flow analogue of :func:`dust3r_confidence_loss`
    (L = mean(conf * ||flow - gt||_2 - alpha * log conf)).

    The reference ships no trainer; this follows the same confidence
    formulation its ``FlowWithConfidenceAdaptor`` scaffolds (reference
    prediction_heads/adaptors.py:25-167 pairs flow with an exp-confidence
    channel exactly as the pointmap heads do).

    out: ``UFMFlow.forward_pair`` dict with ``flow`` (B,H,W,2) and
    ``flow_conf`` (B,H,W,1); target_flow: (B,H,W,2) in pixels;
    valid: optional (B,H,W) mask (occlusions / out-of-frame).
    """
    conf = out["flow_conf"][..., 0]
    diff = out["flow"] - target_flow
    if valid is not None:
        # double-where: flow datasets mark occluded pixels with NaN/inf
        # sentinels; mask the DIFFERENCE (not just the per-pixel loss) or
        # the where-VJP turns them into NaN gradients for every parameter
        diff = jnp.where(valid[..., None], diff, 0.0)
    err = jnp.linalg.norm(diff, axis=-1)
    per_px = conf * err - alpha * jnp.log(conf)
    if valid is not None:
        per_px = jnp.where(valid, per_px, 0.0)
        return jnp.sum(per_px) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.mean(per_px)


class TrainContext:
    "Holds the mesh, split model, optimizer and jitted step."

    def __init__(self, graphdef, rest_state, mesh, tx, step_fn):
        self.graphdef = graphdef
        self.rest_state = rest_state
        self.mesh = mesh
        self.tx = tx
        self.step = step_fn


def make_train_step(
    model: nnx.Module,
    loss_fn: Optional[Callable] = None,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    data: int = -1,
    model_axis: int = 1,
    use_tp: bool = False,
    grad_accum: int = 1,
    zero1: bool = False,
    fsdp: bool = False,
    mu_dtype=None,
    donate: bool = True,
    clip_grad_norm: Optional[float] = None,
    skip_nonfinite: bool = False,
    metrics: bool = False,
    trainable: Optional[Callable[[str], bool]] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainContext, Any, Any]:
    """Build a dp(+tp) sharded train step for a DUSt3R-style model.

    Returns (context, params_state, opt_state). The step signature is
    ``step(params, opt_state, img1, img2, target1, target2) ->
    (loss, params, opt_state)``; inputs should be sharded with
    ``shard_batch(..., ctx.mesh)``.

    zero1: shard the optimizer state over the "data" axis (ZeRO stage 1).
        Optimizer-moment memory drops by the data-axis size; XLA emits the
        slice-update + parameter all-gather from the sharding constraints.
    fsdp: shard the PARAMETERS over the "data" axis (FSDP / ZeRO stage 3,
        ``parallel.mesh.fsdp_shard_state``). Per-chip parameter memory —
        and optimizer-state memory, since ``tx.init`` inherits the
        shardings — drops by the data-axis size; XLA's SPMD partitioner
        inserts the per-layer all-gather and the gradient reduce-scatter
        from the sharding constraints alone. Composes with ``use_tp``
        (TP axes are preserved; "data" lands on the largest free axis).
        For models that fit replicated, prefer plain dp (+``zero1``):
        FSDP trades an all-gather per layer per step for the memory.
    mu_dtype: dtype for adamw's first moment (e.g. ``jnp.bfloat16`` —
        halves its HBM traffic in the bandwidth-bound optimizer, measured
        ~-3.5% step time at ViT-L 512, BASELINE.md round 3). Ignored when
        ``tx`` is given.
    donate: donate the params/opt_state buffers to the jitted step (the
        caller must rebind them from the return value — every in-repo
        caller does). In-place aliasing removes the update's double
        buffering: measured 148.6 -> 126.3 ms/step at ViT-L 512 b2
        (BASELINE.md round 3). Set False only if you must reuse the input
        pytrees after a step.
    clip_grad_norm: clip gradients to this global L2 norm before the
        optimizer (``optax.clip_by_global_norm``). Applies to a
        caller-provided ``tx`` too (chained in front of it).
    skip_nonfinite: wrap the optimizer in ``optax.apply_if_finite`` — a
        step whose gradients contain NaN/Inf leaves params and optimizer
        moments untouched instead of poisoning them (production guard for
        rare bad batches / bf16 overflow). Pass an int to set the
        max-consecutive-skips budget (default 100); once exceeded the
        nonfinite update is applied so the failure is visible rather than
        an infinite silent spin. Under ``grad_accum`` the finiteness check
        runs on the ACCUMULATED gradient, so one bad microbatch skips its
        whole accumulation window.
    metrics: the step additionally returns a metrics dict — signature
        becomes ``step(...) -> (loss, metrics, params, opt_state)`` with
        ``metrics = {"grad_norm": global L2 norm of the (unclipped)
        gradients}``. Costs one fused reduction; off by default so the
        bare-step signature is unchanged.
    trainable: ``(dotted_path) -> bool`` predicate over parameter paths
        (``utils.pytree.keypath_str`` convention, e.g.
        ``"encoder.blocks.0.attn.qkv.kernel.value"``). Paths where it
        returns False are FROZEN: ``jax.lax.stop_gradient`` is applied to
        the leaf inside the loss (XLA then dead-code-eliminates their
        weight-gradient matmuls from the backward — a frozen encoder
        skips its wgrads entirely, not just its update), and the
        optimizer runs through ``optax.multi_transform`` with
        ``optax.set_to_zero`` on the frozen partition, so no moments are
        allocated for frozen leaves. This is the standard
        frozen-pretrained-encoder finetune recipe the reference's
        encoder-zoo design assumes (pretrained encoders + trainable
        info-sharing/heads). Wraps a caller-provided ``tx`` too.
        The FIRST step's trainable-leaf updates match an unfrozen run's
        exactly (per-leaf adamw; activations still carry gradient through
        frozen layers — only the leaves' own grads are stopped); later
        steps diverge because the unfrozen run keeps moving the encoder.
    """
    mesh = make_mesh(data=data, model=model_axis)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    with mesh:
        params = tp_shard_state(params, mesh) if (use_tp and model_axis > 1) else replicate_state(params, mesh)
        if fsdp:
            params = fsdp_shard_state(params, mesh)
        if tx is None:
            tx = optax.adamw(learning_rate, weight_decay=weight_decay, mu_dtype=mu_dtype)
        if clip_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
        if trainable is not None:
            from uniception_tpu.utils.pytree import keypath_str

            labels = jax.tree_util.tree_map_with_path(
                lambda kp, _: "train" if trainable(keypath_str(kp)) else "freeze", params
            )
            frozen_mask = jax.tree.map(lambda l: l == "freeze", labels)
            tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
        else:
            frozen_mask = None
        if skip_nonfinite:
            max_skips = skip_nonfinite if isinstance(skip_nonfinite, int) and not isinstance(skip_nonfinite, bool) else 100
            tx = optax.apply_if_finite(tx, max_consecutive_errors=max_skips)
        if grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
        opt_state = tx.init(params)
        if zero1 or fsdp:
            # under fsdp the moments mirror the param shapes, so the same
            # largest-free-axis rule shards them identically to the params;
            # it also mesh-places tx.init leaves (e.g. adamw's scalar count)
            # that would otherwise carry a single-device sharding and clash
            # with the mesh-wide constraint inside the jitted step
            opt_state = zero1_shard_state(opt_state, mesh)
    # pin the optimizer-state layout across steps: without the constraint
    # XLA is free to re-replicate the moments on the step's outputs,
    # silently undoing the ZeRO-1 memory saving. Leaves without a sharding
    # (non-array entries of a custom tx) map to a sentinel OBJECT, not
    # None — None is pytree structure, and a None would make the
    # tree.map in step() fail with a structure mismatch.
    _NO_SHARDING = object()
    opt_shardings = (
        jax.tree.map(lambda x: getattr(x, "sharding", None) or _NO_SHARDING, opt_state)
        if (zero1 or fsdp)
        else None
    )
    # likewise pin the parameter layout under FSDP — without the constraint
    # XLA may emit replicated (all-gathered) params as the step's outputs,
    # silently undoing the sharding after the first step
    param_shardings = (
        jax.tree.map(lambda x: getattr(x, "sharding", None) or _NO_SHARDING, params) if fsdp else None
    )

    if loss_fn is None:
        def loss_fn(m, img1, img2, target1, target2):
            res1, res2 = m.forward_pair(img1, img2)
            return dust3r_confidence_loss(res1, res2, target1, target2)

    def compute_loss(params, img1, img2, target1, target2):
        if frozen_mask is not None:
            # stop_gradient on the frozen leaves (not the activations):
            # gradients still flow THROUGH frozen layers to earlier
            # trainable ones, but the frozen leaves' own wgrads become
            # structural zeros XLA removes from the backward pass.
            params = jax.tree.map(
                lambda x, f: jax.lax.stop_gradient(x) if f else x, params, frozen_mask
            )
        m = nnx.merge(graphdef, params, rest)
        if fsdp:
            # pin attention activations to batch-on-data while tracing: FSDP's
            # param shardings otherwise propagate through the qkv reshapes
            # into degenerate head-split shardings on softmax intermediates
            # and GSPMD pays an involuntary-full-remat reshard between the
            # forward-saved tensors and the backward (VERDICT r4 weak #1)
            from uniception_tpu.ops.attention import activation_sharding

            with activation_sharding(
                mesh, "data", "model" if (use_tp and model_axis > 1) else None
            ):
                return loss_fn(m, img1, img2, target1, target2)
        return loss_fn(m, img1, img2, target1, target2)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, img1, img2, target1, target2):
        loss, grads = jax.value_and_grad(compute_loss)(params, img1, img2, target1, target2)
        aux = {"grad_norm": optax.global_norm(grads)} if metrics else None
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if param_shardings is not None:
            params = jax.tree.map(
                lambda x, s: x if s is _NO_SHARDING else jax.lax.with_sharding_constraint(x, s),
                params,
                param_shardings,
            )
        if opt_shardings is not None:
            opt_state = jax.tree.map(
                lambda x, s: x if s is _NO_SHARDING else jax.lax.with_sharding_constraint(x, s),
                opt_state,
                opt_shardings,
            )
        if metrics:
            return loss, aux, params, opt_state
        return loss, params, opt_state

    return TrainContext(graphdef, rest, mesh, tx, step), params, opt_state


def ema_init(params):
    "Fresh EMA state = a copy of the params (same shardings)."
    return jax.tree.map(lambda x: x + 0, params)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def ema_update(ema, params, decay: float = 0.999):
    """One exponential-moving-average step: ``ema = decay*ema + (1-decay)*p``.

    The serving-quality weight average used by most large vision trainings
    (the reference ships no trainer — SURVEY.md §0). Donates the old EMA
    buffers, so per-step cost is one fused HBM-bound pass; call it on the
    params returned by the train step and checkpoint the EMA pytree like
    any other state (``save_train_state(..., opt_state=ema)`` or a second
    checkpoint path).
    """
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params)


class PreemptionGuard:
    """Signal-driven graceful shutdown for TPU-pod preemptions.

    TPU maintenance events and spot reclaims deliver SIGTERM with a grace
    window; a production trainer must finish the in-flight step, checkpoint,
    and exit — not die mid-optimizer-update. (The reference ships no trainer
    at all, SURVEY.md §0; this is part of the training layer the rebuild
    adds.)

    The handler only sets a flag — no work happens in signal context. Poll
    :meth:`should_stop` at step boundaries; combined with
    ``save_train_state`` + the step-indexed ``DeterministicSampler``, a
    preempted-and-resumed run is bit-identical to an uninterrupted one
    (proven in ``tests/examples/test_train_example.py``).

    Multi-host: a preemption SIGTERM may reach only some processes (or reach
    them at different step boundaries). When ``jax.process_count() > 1``,
    ``should_stop`` ORs the flag across processes with a host allgather so
    every process checkpoints at the SAME step — a divergent stop would
    deadlock the collective-issuing processes against the exiting one. The
    sync costs one tiny DCN collective per call; poll every step (it is
    microseconds against a real step) or amortize with ``sync_every``.
    """

    def __init__(self, signals=None, sync_every: int = 1):
        import signal as _signal

        self._signal = _signal
        self._requested = False
        self._prev = {}
        self._sync_every = max(1, int(sync_every))
        self._calls = 0
        self._synced_stop = False
        for s in signals if signals is not None else (_signal.SIGTERM, _signal.SIGINT):
            self._prev[s] = _signal.signal(s, self._handler)

    def _handler(self, signum, frame):
        self._requested = True

    @property
    def requested(self) -> bool:
        "This process's local flag (no cross-process sync)."
        return self._requested

    def should_stop(self) -> bool:
        "True once any participating process has received a stop signal."
        if self._synced_stop:
            return True
        if jax.process_count() == 1:
            return self._requested
        # participation in the allgather must be decided by the call counter
        # ALONE (identical on every process) — gating it on the local flag
        # would have a signaled process join a collective the others skip,
        # which deadlocks; a locally-signaled process therefore waits for
        # the next sync boundary like everyone else
        self._calls += 1
        if self._calls % self._sync_every:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(jnp.asarray(self._requested))
        self._synced_stop = bool(flags.any())
        return self._synced_stop

    def close(self):
        "Restore the previously-installed signal handlers."
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        self._prev = {}


def save_train_state(path: str, params, opt_state=None, step: int = 0, wait: bool = True):
    """Save the full training state (params + optimizer state + step) with Orbax.

    The pytrees are stored as flat leaf lists so arbitrary optimizer-state
    structures (optax NamedTuples wrapping nnx.State) round-trip without
    Orbax needing to understand them; :func:`restore_train_state` rebuilds
    the structures from templates.

    wait=False makes the save asynchronous: Orbax snapshots the arrays
    (device→host copy) before returning and writes to disk in a background
    thread, so training can keep stepping while the checkpoint lands —
    donated steps are safe because the old param buffers were already
    copied. Returns the checkpointer; call ``.wait_until_finished()``
    (or issue the next save, which barriers on the previous one) before
    reading the checkpoint or exiting.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": list(jax.tree.leaves(params)),
        "opt_state": list(jax.tree.leaves(opt_state)) if opt_state is not None else [],
        "step": jnp.asarray(step, jnp.int32),
    }
    ckptr.save(path, payload, force=True)
    if wait:
        ckptr.wait_until_finished()
        return None
    return ckptr


def restore_train_state(path: str, params_template, opt_state_template=None):
    """Restore (params, opt_state, step) saved by :func:`save_train_state`.

    Templates supply the pytree structure (and nnx.State/optax wrappers);
    the restored leaves are placed into it. ``opt_state`` is None when no
    optimizer state was saved or no template is given. Restored arrays are
    unsharded — re-apply ``tp_shard_state``/``replicate_state`` for meshes.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    params = jax.tree.unflatten(jax.tree.structure(params_template), restored["params"])
    opt_state = None
    if opt_state_template is not None and restored.get("opt_state"):
        opt_state = jax.tree.unflatten(jax.tree.structure(opt_state_template), restored["opt_state"])
    step = int(restored.get("step", 0))
    return params, opt_state, step
