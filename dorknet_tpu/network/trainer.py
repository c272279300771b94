"""Trainer — the fully-fused fast path: forward + backward + optimiser update in
ONE donated jitted XLA program per step.

The reference-compatible triple (``network.forward`` / ``network.backward`` /
``optimiser.update_weights``) costs two dispatches per step; this collapses them
to one and lets XLA overlap the weight update with the tail of the backward pass.
Params/opt-state buffers are donated, so the step is in-place in HBM.

Works on any device layout: pass ``batch_sharding``/``param_sharding`` (see
``dorknet_tpu.parallel``) to run data/model-parallel over a mesh — the batch-norm
means and the gradient reductions become ICI collectives automatically because
jit arrays have global semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dorknet_tpu.layers.base import to_nhwc


class Trainer:
    def __init__(self, network, optimiser, batch_sharding=None, param_sharding=None,
                 remat=False, input_layout="NCHW", ema_decay=None,
                 clip_norm=None):
        """remat=True wraps the WHOLE forward in ``jax.checkpoint`` (max memory
        saving, ~1 extra forward of FLOPs); remat="blocks" checkpoints each
        ResidualBlock individually — a finer FLOP/memory trade (block inputs
        are kept, only intra-block activations are recomputed).

        input_layout="NHWC" accepts batches already in the internal layout
        (e.g. straight from device_augment) and skips the NCHW→NHWC transpose.

        ema_decay (e.g. 0.999) maintains an exponential moving average of the
        weights INSIDE the fused step program (zero extra dispatches — an
        extra dispatch costs ~10 ms through this host's TPU link). The shadow
        tree initialises to the params at the first step; read it with
        ``ema_params()`` or serve it with ``ema_network()``. The reference has
        no EMA; this is a production-serving addition.

        clip_norm (e.g. 1.0) rescales the gradient tree to a maximum GLOBAL
        L2 norm before the optimiser update, inside the fused step (applies
        to step / multi_step / accumulate_step alike; in accumulate_step the
        clip acts on the K-microbatch MEAN gradient, matching a large-batch
        step). The norm is computed in fp32. The reference has no clipping;
        standard production stabiliser."""
        self.network = network
        self.optimiser = optimiser
        self.batch_sharding = batch_sharding
        self.param_sharding = param_sharding
        self.remat = remat
        assert input_layout in ("NCHW", "NHWC")
        self.input_layout = input_layout
        self.ema_decay = None if ema_decay is None else float(ema_decay)
        self.clip_norm = None if clip_norm is None else float(clip_norm)
        if self.clip_norm is not None and self.clip_norm <= 0:
            raise ValueError("clip_norm must be positive")
        self._jit_cache = {}
        self._cache = None  # optimiser state over the FULL network params tree
        self._ema = None    # shadow params tree (when ema_decay is set)

    def _signature(self):
        from dorknet_tpu.config import trace_signature

        # the CLASS is part of the key: different optimisers can share a
        # hyper tuple (SGDMomentum(0.9) vs RMSProp(0.9)) but trace different
        # update rules
        hyper = (type(self.optimiser).__name__,) + (
            self.optimiser.hyper_key()
            if hasattr(self.optimiser, "hyper_key") else ())
        return (self.network._version, self.remat, self.input_layout,
                self.ema_decay, self.clip_norm, hyper, trace_signature(),
                tuple(l._trace_signature() for l in self.network.layers))

    def _clip_grads(self, grads):
        """Global-L2-norm clip (identity when clip_norm is None), traced
        inside the step. fp32 norm; each leaf keeps its own dtype."""
        if self.clip_norm is None:
            return grads
        leaves = jax.tree_util.tree_leaves(grads)
        sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
        norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, self.clip_norm / jnp.maximum(norm, 1e-12))
        return jax.tree_util.tree_map(
            lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads)

    def _ema_update(self, ema, new_params):
        """decay*ema + (1-decay)*params, traced inside the step program.
        When ema_decay is None this is the identity on an empty (None) tree."""
        if self.ema_decay is None:
            return ema
        d = self.ema_decay
        return jax.tree_util.tree_map(
            lambda e, p: (d * e + (1.0 - d) * p).astype(p.dtype),
            ema, new_params)

    def _ensure_ema(self, params):
        if self.ema_decay is not None and self._ema is None:
            self._ema = jax.tree_util.tree_map(jnp.array, params)

    def ema_params(self):
        """A copy of the shadow (EMA) params tree — None before the first
        step. (A copy because the live tree's buffers are donated in-place by
        the next step.)"""
        if self._ema is None:
            return None
        return jax.tree_util.tree_map(jnp.array, self._ema)

    def ema_network(self):
        """A deep copy of the network carrying the EMA weights — serve it with
        InferenceRunner/QuantizedInferenceRunner or checkpoint it."""
        import copy

        from dorknet_tpu.utils.fold_bn import _clear_jit_caches

        if self._ema is None:
            raise ValueError("no EMA yet: construct Trainer(ema_decay=...) "
                             "and run at least one step")
        # clear SOURCE caches (network-level and per-layer, recursively)
        # BEFORE deepcopy — copying populated caches drags every compiled
        # PjitFunction through deepcopy and retains them in the served
        # object for its lifetime (they regenerate on the next forward)
        self.network._jit_cache = {}
        self.network._cam_cache = {}
        _clear_jit_caches(self.network.layers)
        if self.network.loss_layer is not None:
            self.network.loss_layer._jit_cache = {}
        net = copy.deepcopy(self.network)
        # COPY the shadow buffers out: the next step donates self._ema's
        # buffers in-place, which would invalidate a served alias
        ema_copy = jax.tree_util.tree_map(lambda e: jnp.array(e), self._ema)
        for l, p in zip(net.layers, ema_copy):
            l.set_params(p)
        net._version += 1
        return net

    def _to_internal(self, X):
        return X if self.input_layout == "NHWC" else to_nhwc(X)

    def _safe_grads_ctx(self):
        """SPMD-safe gradient rules whenever this trainer runs sharded (see
        config.spmd_safe_grads): the flag is read at TRACE time by the ops
        layer and is part of trace_signature(), so sharded and single-device
        trainers get distinct step programs."""
        from dorknet_tpu.config import spmd_safe_grads, use_spmd_safe_grads

        # OR, never AND: an externally enabled flag (user forcing safe rules)
        # must survive this trainer's own context
        return spmd_safe_grads(use_spmd_safe_grads()
                               or self.batch_sharding is not None
                               or self.param_sharding is not None)

    def _forward_loss(self, params, states, X, y_one_hot, internal=False):
        """(loss_for_grad, (loss_reported, probs, new_states)) — optionally
        rematerialised. internal=True means X is already in the internal
        (NHWC) layout regardless of input_layout (the fused-augmentation
        path produces it there)."""
        network = self.network

        layer_wrap = None
        if self.remat == "blocks":
            def layer_wrap(l, apply):
                if type(l).__name__ == "ResidualBlock":
                    return jax.checkpoint(apply, static_argnums=(3,))
                return apply

        def fwd(p, x):
            out, new_states, reported_reg, full_reg, _ = network._run_layers(
                p, states, x, train=True, layer_wrap=layer_wrap)
            return out, (new_states, reported_reg, full_reg)

        if self.remat is True:
            fwd = jax.checkpoint(fwd)
        x = X if internal else self._to_internal(X)
        out, (new_states, reported_reg, full_reg) = fwd(params, x)
        data_loss, probs = network.loss_layer.fapply_loss(out, y_one_hot)
        return data_loss + full_reg, (data_loss + reported_reg, probs, new_states)

    def _get_step(self):
        key = self._signature()
        if key not in self._jit_cache:
            network = self.network
            optimiser = self.optimiser

            trainer = self

            def step(params, states, cache, ema, X, y_one_hot, lr):
                grads, (loss, probs, new_states) = jax.grad(
                    lambda p: trainer._forward_loss(p, states, X, y_one_hot),
                    has_aux=True)(params)
                grads = trainer._clip_grads(grads)
                new_params, new_cache = optimiser.apply_update(params, grads, cache, lr)
                preds = jnp.argmax(probs, axis=1)
                new_ema = trainer._ema_update(ema, new_params)
                return new_params, new_states, new_cache, new_ema, loss, preds

            # states (argnum 1) deliberately NOT donated: they're tiny (BN
            # running stats) and user code / InferenceRunner may hold the
            # previous buffers (reference semantics allow reading
            # non_learned_params at any time)
            self._jit_cache[key] = jax.jit(step, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def _sharding_for(self, ndim):
        """``batch_sharding`` truncated to ``ndim`` dims. A spatial input spec
        (4 entries, see parallel.spatial_batch_sharding) must not be applied
        to the 2-D label tensor — labels shard by the batch axis alone."""
        s = self.batch_sharding
        if s is None or len(s.spec) <= ndim:
            return s
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(s.mesh, P(*s.spec[:ndim]))

    def _place_stacked(self, X_stack, y_stack, keep_x_dtype=False):
        """Place (K, B, ...) stacks: dim 1 (batch) sharded per
        batch_sharding, the K dim replicated. keep_x_dtype preserves the raw
        batch dtype (uint8 stays 1 byte/pixel for the fused-aug path);
        labels are always float32."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.batch_sharding is not None:
            s = self.batch_sharding
            sharding = NamedSharding(s.mesh, P(None, *s.spec))
            sy = self._sharding_for(2)
            sharding_y = NamedSharding(sy.mesh, P(None, *sy.spec))
        else:
            sharding = sharding_y = None
        if not isinstance(X_stack, jax.Array):
            X_stack = np.ascontiguousarray(
                X_stack) if keep_x_dtype else np.ascontiguousarray(
                X_stack, dtype=np.float32)
        if not isinstance(y_stack, jax.Array):
            y_stack = np.ascontiguousarray(y_stack, dtype=np.float32)
        return (jax.device_put(X_stack, sharding),
                jax.device_put(y_stack, sharding_y))

    def _place_batch(self, X, y):
        # device_put (async) — measurably faster than jnp.asarray through the
        # host↔TPU link, and already-placed jax.Arrays pass through untouched.
        # For real input pipelines use data_loading.device_prefetch to overlap
        # the transfer with the previous step's compute.
        if not isinstance(X, jax.Array):
            X = np.ascontiguousarray(X, dtype=np.float32)
        if not isinstance(y, jax.Array):
            y = np.ascontiguousarray(y, dtype=np.float32)
        X = jax.device_put(X, self.batch_sharding)
        y = jax.device_put(y, self._sharding_for(2))
        return X, y

    def _prepare(self):
        """Shared step preamble: gather params/states, one-time param
        placement, optimiser-cache init (invalidated when the OPTIMISER
        OBJECT changes — reusing another optimiser's state tree, e.g.
        momentum buffers as RMSProp accumulators, would be silently wrong),
        EMA shadow init. Returns (params, states)."""
        network = self.network
        params = network.gather_params()
        states = network.gather_states()
        if self.param_sharding is not None and not getattr(self, "_params_placed", False):
            # place once — step outputs keep their shardings thereafter
            params = jax.device_put(params, self.param_sharding)
            self._params_placed = True
        if getattr(self, "_cache_owner", None) is not self.optimiser:
            self._cache = None
            self._cache_owner = self.optimiser
        if self._cache is None:
            self._cache = self.optimiser.init_cache(params)
        self._ensure_ema(params)
        return params, states

    def _commit(self, new_params, new_states):
        for l, p in zip(self.network.layers, new_params):
            l.set_params(p)
        self.network.scatter_states(new_states)

    def step(self, X, y_one_hot):
        """One fused train step. Returns (loss, predicted_class_ids) as device
        arrays (don't block on them — the next step can be dispatched while these
        materialise)."""
        params, states = self._prepare()
        X, y_one_hot = self._place_batch(X, y_one_hot)

        with self._safe_grads_ctx():
            fn = self._get_step()
            new_params, new_states, self._cache, self._ema, loss, preds = fn(
                params, states, self._cache, self._ema, X, y_one_hot,
                self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return loss, preds

    # ------------------------------------------------------------------ #
    # Gradient accumulation: one optimiser update from K micro-batches whose
    # grads are averaged in a lax.scan — emulates batch K*B within the HBM
    # footprint of batch B (pairs well with remat=True).
    # NB: batch-norm statistics are per-MICRO-batch (each micro-batch runs its
    # own BN forward), not per-effective-batch. One deliberate wrinkle on a
    # FRESH network: the BN-initialisation pre-pass adopts micro-batch 0's
    # statistics and the scan then EMAs all K micro-batches (including 0
    # again), so batch 0 is weighted twice in the running stats on that first
    # call only — a one-time momentum-0.95 bias accepted to keep the scan a
    # single static-K program (gradients are NOT double-counted; sequential
    # small-batch semantics hold exactly from the second call on).
    # ------------------------------------------------------------------ #
    def _get_accum_step(self):
        key = ("accum",) + self._signature()
        if key not in self._jit_cache:
            trainer = self
            optimiser = self.optimiser

            def accum(params, states, cache, ema, Xs, ys, lr):
                K = Xs.shape[0]

                def body(carry, batch):
                    g_acc, states, loss_acc = carry
                    X, y = batch
                    grads, (loss, probs, new_states) = jax.grad(
                        lambda p: trainer._forward_loss(p, states, X, y),
                        has_aux=True)(params)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, new_states, loss_acc + loss), None

                zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
                (g_sum, new_states, loss_sum), _ = jax.lax.scan(
                    body, (zero_g, states, 0.0), (Xs, ys))
                g_mean = jax.tree_util.tree_map(lambda g: g / K, g_sum)
                g_mean = trainer._clip_grads(g_mean)
                new_params, new_cache = optimiser.apply_update(
                    params, g_mean, cache, lr)
                new_ema = trainer._ema_update(ema, new_params)
                return new_params, new_states, new_cache, new_ema, loss_sum / K

            self._jit_cache[key] = jax.jit(accum, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def accumulate_step(self, X_stack, y_stack):
        """One optimiser update from the averaged gradients of K micro-batches
        (X_stack: (K, B, C, H, W)). Returns the mean reported loss."""
        network = self.network
        if not all(l.bn_initialized() for l in network.layers):
            # initialise BN running stats WITHOUT an optimiser update (a plain
            # training-mode forward writes them), so micro-batch 0 is not
            # double-counted. network.forward expects NCHW.
            X0 = X_stack[0]
            if self.input_layout == "NHWC":
                X0 = jnp.transpose(jnp.asarray(X0), (0, 3, 1, 2))
            network.forward(X0, y_stack[0])
            network._pending_grads = None
        params, states = self._prepare()
        Xs, ys = self._place_batch(X_stack, y_stack)
        with self._safe_grads_ctx():
            fn = self._get_accum_step()
            new_params, new_states, self._cache, self._ema, loss = fn(
                params, states, self._cache, self._ema, Xs, ys,
                self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return loss

    # ------------------------------------------------------------------ #
    # Multi-step: K train steps in ONE dispatch via lax.scan — amortises the
    # per-dispatch host latency (the dominant cost at small batch sizes
    # through the TPU host link).
    # ------------------------------------------------------------------ #
    def _get_multi_step(self):
        key = ("multi",) + self._signature()
        if key not in self._jit_cache:
            network = self.network
            optimiser = self.optimiser

            trainer = self

            def multi(params, states, cache, ema, Xs, ys, lr):
                def body(carry, batch):
                    params, states, cache, ema = carry
                    X, y = batch
                    grads, (loss, probs, new_states) = jax.grad(
                        lambda p: trainer._forward_loss(p, states, X, y),
                        has_aux=True)(params)
                    grads = trainer._clip_grads(grads)
                    new_params, new_cache = optimiser.apply_update(
                        params, grads, cache, lr)
                    preds = jnp.argmax(probs, axis=1)
                    new_ema = trainer._ema_update(ema, new_params)
                    return (new_params, new_states, new_cache, new_ema), (loss, preds)

                (params, states, cache, ema), (losses, preds) = jax.lax.scan(
                    body, (params, states, cache, ema), (Xs, ys))
                return params, states, cache, ema, losses, preds

            self._jit_cache[key] = jax.jit(multi, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def multi_step(self, X_stack, y_stack):
        """Run K fused train steps in one XLA dispatch. X_stack: (K, B, C, H, W),
        y_stack: (K, B, num_classes). Returns (losses (K,), preds (K, B)).

        Requires batch-norm running stats to be initialised (the first-batch
        adoption is a different trace) — if they aren't, ALL K slices of this
        first call run through the single-step program (one compile that is
        reused forever) rather than compiling a throwaway K-1-length scan
        used exactly once."""
        network = self.network
        if not all(l.bn_initialized() for l in network.layers):
            losses, preds = [], []
            for i in range(X_stack.shape[0]):
                li, pi = self.step(X_stack[i], y_stack[i])
                losses.append(li)
                preds.append(pi)
            return jnp.stack(losses), jnp.stack(preds)

        params, states = self._prepare()
        Xs, ys = self._place_stacked(X_stack, y_stack)

        with self._safe_grads_ctx():
            fn = self._get_multi_step()
            new_params, new_states, self._cache, self._ema, losses, preds = fn(
                params, states, self._cache, self._ema, Xs, ys,
                self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return losses, preds

    # ------------------------------------------------------------------ #
    # Fused augmentation + training: the whole input pipeline tail (crop/
    # HSV/rotation/flip, -128 shift, mixup) runs INSIDE the one compiled
    # step program. The host uploads raw uint8 precrop batches (1 byte/px —
    # 4x smaller transfers than fp32) and pays ONE dispatch per step (or per
    # K steps with multi_step_augmented) instead of aug + train separately;
    # the augmented batch never round-trips through HBM between programs.
    # The reference runs this stage on host threads (image_preprocessor.py
    # + image_data_loader.py mixup); here it is the same XLA program as the
    # gradient step.
    # ------------------------------------------------------------------ #
    def _freeze_aug(self, out_hw, hsv_pert_tuples, rotation_tuple,
                    horizontal_flip_prob, crop_mode, mixup):
        """Resolve the augmentation config into the hashable static tuple
        passed to _train_pipeline_impl (and used as part of the jit key).
        aug_dtype and the pallas-augmentation gate are resolved from the
        global policies here, at trace-key time, exactly like train_pipeline
        does. Unlike the standalone aug program (where the kernel defaults
        ON for TPU — a wall-confirmed 1.6x win), INSIDE the fused step the
        kernel defaults OFF: measured 3.0x device / 2.2x wall SLOWER than
        the planes path in-program (48.4 vs 16.3 ms/step device, 55.2 vs
        25.0 ms wall, b128
        bf16 — the custom-call boundary splits the step program around the
        B-step serial kernel grid; PERF.md round-3 session-5). Opt in
        explicitly with config.set_use_pallas_aug(True) or the legacy
        global set_use_pallas(True) (the A/B harnesses use these). The
        gate additionally requires a real TPU backend AND a non-sharded
        trainer: under a mesh, pallas_call has no SPMD partitioning rule,
        so GSPMD would all-gather the batch-sharded uint8 stack to every
        device and redo the full-batch aug grid per replica — numerically
        right, silently unscalable (the same hole the conv gate's
        use_spmd_safe_grads() check closes)."""
        from dorknet_tpu.config import (get_compute_dtype, use_pallas,
                                        use_pallas_aug)

        def tt(v):  # tuples all the way down (configs arrive as lists)
            return tuple(tuple(e) if isinstance(e, (list, tuple)) else e
                         for e in v) if isinstance(v, (list, tuple)) else v

        tri = use_pallas_aug()
        pallas_aug = ((tri is True or (tri is None and use_pallas()))
                      and self.batch_sharding is None
                      and self.param_sharding is None
                      and jax.default_backend() == "tpu")
        return (tuple(out_hw), tt(hsv_pert_tuples), tt(rotation_tuple),
                horizontal_flip_prob, crop_mode, tt(mixup),
                jnp.dtype(get_compute_dtype()).name, pallas_aug)

    def _build_aug_step(self, aug):
        """The un-jitted fused aug+train step body, shared by the direct
        (batch-in) and indexed (dataset-resident gather) entry points."""
        from dorknet_tpu.data_loading.device_augment import \
            _train_pipeline_impl

        optimiser = self.optimiser
        trainer = self
        (out_hw, hsv, rot, flip, crop_mode, mixup, aug_dtype,
         pallas_aug) = aug

        def step(params, states, cache, ema, rng, Xu8, one_hot, lr):
            x, y = _train_pipeline_impl(
                rng, Xu8, one_hot, out_hw, hsv, rot, flip, crop_mode,
                mixup, "NHWC", "planes", aug_dtype, pallas_aug)
            grads, (loss, probs, new_states) = jax.grad(
                lambda p: trainer._forward_loss(p, states, x, y,
                                                internal=True),
                has_aux=True)(params)
            grads = trainer._clip_grads(grads)
            new_params, new_cache = optimiser.apply_update(
                params, grads, cache, lr)
            preds = jnp.argmax(probs, axis=1)
            new_ema = trainer._ema_update(ema, new_params)
            return new_params, new_states, new_cache, new_ema, loss, preds

        return step

    def _get_aug_step(self, aug):
        key = ("aug",) + aug + self._signature()
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._build_aug_step(aug),
                                           donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def _get_indexed_aug_step(self, aug, num_classes):
        key = ("aug-idx", num_classes) + aug + self._signature()
        if key not in self._jit_cache:
            base = self._build_aug_step(aug)

            def step(params, states, cache, ema, rng, images, labels, rows,
                     lr):
                # HBM-resident dataset: the gather and the one-hot live
                # INSIDE the step program, so a training step moves only
                # (B,) int32 indices from the host — the TPU-native answer
                # to the reference's keep-the-device-fed producer thread
                # (reference data_loading/image_data_loader.py:88-117) once
                # the packed dataset fits in HBM.
                Xu8 = jnp.take(images, rows, axis=0)
                one_hot = jax.nn.one_hot(jnp.take(labels, rows), num_classes,
                                         dtype=jnp.float32)
                return base(params, states, cache, ema, rng, Xu8, one_hot,
                            lr)

            self._jit_cache[key] = jax.jit(step, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def _place_raw(self, X, y):
        """Placement that PRESERVES the raw batch dtype (uint8 stays 1
        byte/pixel on the wire, unlike _place_batch's float32 contract)."""
        if not isinstance(X, jax.Array):
            X = np.ascontiguousarray(X)
        if not isinstance(y, jax.Array):
            y = np.ascontiguousarray(y, dtype=np.float32)
        return (jax.device_put(X, self.batch_sharding),
                jax.device_put(y, self._sharding_for(2)))

    def step_augmented(self, rng, X_precrop, one_hot, out_hw,
                       hsv_pert_tuples=None, rotation_tuple=None,
                       horizontal_flip_prob=None, crop_mode="random",
                       mixup=None):
        """One fused augment+train step. X_precrop: (B, H, W, C) BGR in
        [0, 255] — uint8 straight from the loader (emit_hwc_uint8=True) or
        float32. rng: a jax.random key. With mixup the step trains 2B images
        (both convex orderings, reference pairing). Returns (loss, preds) as
        device arrays. Numerically equal to train_pipeline(...) followed by
        step(..., input_layout="NHWC") AT MATCHING pallas-aug gate settings
        — note the per-site defaults differ on TPU backends (train_pipeline
        defaults the pallas aug kernel ON, this fused step defaults it OFF;
        the kernel's output may differ from the planes path by 1 uint8 step
        on ~0.005% of pixels), so force one side via
        config.set_use_pallas_aug / the use_pallas_aug argument when
        comparing the two paths."""
        aug = self._freeze_aug(out_hw, hsv_pert_tuples, rotation_tuple,
                               horizontal_flip_prob, crop_mode, mixup)
        params, states = self._prepare()
        X, y = self._place_raw(X_precrop, one_hot)
        with self._safe_grads_ctx():
            fn = self._get_aug_step(aug)
            new_params, new_states, self._cache, self._ema, loss, preds = fn(
                params, states, self._cache, self._ema, rng, X, y,
                self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return loss, preds

    def step_augmented_indexed(self, rng, images, labels, rows, out_hw,
                               num_classes, hsv_pert_tuples=None,
                               rotation_tuple=None,
                               horizontal_flip_prob=None, crop_mode="random",
                               mixup=None):
        """One fused gather+augment+train step over an HBM-resident dataset
        (data_loading.DeviceResidentDataset). images: (N, H, W, C) uint8
        device array (the WHOLE dataset, uploaded once); labels: (N,) int32
        device array; rows: (B,) int row indices for this step — the only
        per-step host->device traffic. Numerically equal to
        ``step_augmented(rng, images[rows], one_hot(labels[rows]), ...)``
        (pinned by test_device_dataset). The sampling protocol (shuffle /
        class balance / data_shard) stays host-side, producing indices —
        full ImageDataLoader parity at ~4 bytes/image moved instead of the
        reference's whole-canvas producer pipeline (reference
        data_loading/image_data_loader.py:88-117)."""
        aug = self._freeze_aug(out_hw, hsv_pert_tuples, rotation_tuple,
                               horizontal_flip_prob, crop_mode, mixup)
        params, states = self._prepare()
        if not isinstance(rows, jax.Array):
            rows = jax.device_put(np.ascontiguousarray(rows, dtype=np.int32),
                                  self._sharding_for(1))
        with self._safe_grads_ctx():
            fn = self._get_indexed_aug_step(aug, int(num_classes))
            new_params, new_states, self._cache, self._ema, loss, preds = fn(
                params, states, self._cache, self._ema, rng, images, labels,
                rows, self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return loss, preds

    def _get_multi_aug_step(self, aug):
        key = ("multi-aug",) + aug + self._signature()
        if key not in self._jit_cache:
            from dorknet_tpu.data_loading.device_augment import \
                _train_pipeline_impl

            optimiser = self.optimiser
            trainer = self
            (out_hw, hsv, rot, flip, crop_mode, mixup, aug_dtype,
             pallas_aug) = aug

            def multi(params, states, cache, ema, rngs, Xs, ys, lr):
                def body(carry, batch):
                    params, states, cache, ema = carry
                    rng, Xu8, one_hot = batch
                    x, y = _train_pipeline_impl(
                        rng, Xu8, one_hot, out_hw, hsv, rot, flip,
                        crop_mode, mixup, "NHWC", "planes", aug_dtype,
                        pallas_aug)
                    grads, (loss, probs, new_states) = jax.grad(
                        lambda p: trainer._forward_loss(p, states, x, y,
                                                        internal=True),
                        has_aux=True)(params)
                    grads = trainer._clip_grads(grads)
                    new_params, new_cache = optimiser.apply_update(
                        params, grads, cache, lr)
                    preds = jnp.argmax(probs, axis=1)
                    new_ema = trainer._ema_update(ema, new_params)
                    return (new_params, new_states, new_cache, new_ema), (loss, preds)

                (params, states, cache, ema), (losses, preds) = jax.lax.scan(
                    body, (params, states, cache, ema), (rngs, Xs, ys))
                return params, states, cache, ema, losses, preds

            self._jit_cache[key] = jax.jit(multi, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def multi_step_augmented(self, rngs, X_stack, y_stack, out_hw,
                             hsv_pert_tuples=None, rotation_tuple=None,
                             horizontal_flip_prob=None, crop_mode="random",
                             mixup=None):
        """K fused augment+train steps in ONE dispatch (lax.scan).
        rngs: (K,) stacked jax.random keys (jax.random.split(key, K));
        X_stack: (K, B, H, W, C) uint8/float32 precrop batches. Requires
        initialised BN running stats, like multi_step — falls back to K
        single augmented steps on a fresh network (same trace reused
        forever, no throwaway compile)."""
        if not all(l.bn_initialized() for l in self.network.layers):
            losses, preds = [], []
            for i in range(X_stack.shape[0]):
                li, pi = self.step_augmented(
                    rngs[i], X_stack[i], y_stack[i], out_hw,
                    hsv_pert_tuples, rotation_tuple, horizontal_flip_prob,
                    crop_mode, mixup)
                losses.append(li)
                preds.append(pi)
            return jnp.stack(losses), jnp.stack(preds)

        aug = self._freeze_aug(out_hw, hsv_pert_tuples, rotation_tuple,
                               horizontal_flip_prob, crop_mode, mixup)
        params, states = self._prepare()
        Xs, ys = self._place_stacked(X_stack, y_stack, keep_x_dtype=True)

        with self._safe_grads_ctx():
            fn = self._get_multi_aug_step(aug)
            new_params, new_states, self._cache, self._ema, losses, preds = fn(
                params, states, self._cache, self._ema, rngs, Xs, ys,
                self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return losses, preds

    def _get_multi_indexed_aug_step(self, aug, num_classes):
        key = ("multi-aug-idx", num_classes) + aug + self._signature()
        if key not in self._jit_cache:
            base = self._build_aug_step(aug)

            def multi(params, states, cache, ema, images, labels, rngs,
                      rows_stack, lr):
                def body(carry, batch):
                    params, states, cache, ema = carry
                    rng, rows = batch
                    Xu8 = jnp.take(images, rows, axis=0)
                    one_hot = jax.nn.one_hot(jnp.take(labels, rows),
                                             num_classes, dtype=jnp.float32)
                    (params, states, cache, ema, loss,
                     preds) = base(params, states, cache, ema, rng, Xu8,
                                   one_hot, lr)
                    return (params, states, cache, ema), (loss, preds)

                (params, states, cache, ema), (losses, preds) = jax.lax.scan(
                    body, (params, states, cache, ema), (rngs, rows_stack))
                return params, states, cache, ema, losses, preds

            self._jit_cache[key] = jax.jit(multi, donate_argnums=(0, 2, 3))
        return self._jit_cache[key]

    def multi_step_augmented_indexed(self, rngs, images, labels, rows_stack,
                                     out_hw, num_classes,
                                     hsv_pert_tuples=None,
                                     rotation_tuple=None,
                                     horizontal_flip_prob=None,
                                     crop_mode="random", mixup=None):
        """K fused gather+augment+train steps over an HBM-resident dataset
        in ONE dispatch (lax.scan): rows_stack is (K, B) int32 — K training
        steps leave the host as one program call carrying only K*B*4 bytes
        of indices, amortising the per-dispatch link latency the same way
        multi_step does for device-resident batches (CLAUDE.md: ~10 ms/
        dispatch through the tunnel). rngs: (K,) stacked keys. Per-step
        numerics equal step_augmented_indexed (pinned by test). Fresh-net
        fallback matches multi_step_augmented: BN's first-batch adoption is
        a static trace condition, so an uninitialised network takes K
        single steps instead of compiling a throwaway scan."""
        if not all(l.bn_initialized() for l in self.network.layers):
            losses, preds = [], []
            for i in range(len(rows_stack)):
                li, pi = self.step_augmented_indexed(
                    rngs[i], images, labels, rows_stack[i], out_hw,
                    num_classes, hsv_pert_tuples, rotation_tuple,
                    horizontal_flip_prob, crop_mode, mixup)
                losses.append(li)
                preds.append(pi)
            return jnp.stack(losses), jnp.stack(preds)

        aug = self._freeze_aug(out_hw, hsv_pert_tuples, rotation_tuple,
                               horizontal_flip_prob, crop_mode, mixup)
        params, states = self._prepare()
        if not isinstance(rows_stack, jax.Array):
            rows_stack = jax.device_put(
                np.ascontiguousarray(rows_stack, dtype=np.int32))
        with self._safe_grads_ctx():
            fn = self._get_multi_indexed_aug_step(aug, int(num_classes))
            new_params, new_states, self._cache, self._ema, losses, preds = fn(
                params, states, self._cache, self._ema, images, labels,
                rngs, rows_stack, self.optimiser.device_lr())
        self._commit(new_params, new_states)
        return losses, preds
