"""Batched inference runner — the serving path.

The reference's inference story is the ad-hoc eval loop (test-mode forward per
batch with host argmax, network/feed_forward_network.py:72-88 of the
reference). For production serving on TPU the wants are different: ONE
fixed-shape compiled program (no recompiles on ragged final batches — they are
padded and sliced), params gathered once, batches streamed through async
device_put, and optional mesh sharding for batch-parallel serving.
"""

import numpy as np
import jax
import jax.numpy as jnp


class InferenceRunner:
    def __init__(self, network, batch_size, batch_sharding=None, fold_bn=False):
        """fold_bn=True serves a BN-folded copy of the network (conv→BN pairs
        collapsed — utils/fold_bn) for one fewer activation pass per BN."""
        self._source = network
        self._fold = bool(fold_bn)
        if fold_bn:
            from dorknet_tpu.utils.fold_bn import fold_batch_norms

            network = fold_batch_norms(network)
        network._require_bn_initialized("InferenceRunner")
        self.network = network
        self.batch_size = int(batch_size)
        self.batch_sharding = batch_sharding
        self._params = network.gather_params()
        self._states = network.gather_states()
        self._build_jit()

    def _build_jit(self):
        """(Re)trace the serving program under the CURRENT global policies.
        The jit is keyed on config.trace_signature() like every other cache
        in the repo: flipping set_compute_dtype / set_matmul_precision /
        set_use_pallas after construction must retrace, not silently serve
        the stale program (the stale-trace class CLAUDE.md documents)."""
        from dorknet_tpu.config import trace_signature

        net = self.network
        self._sig = trace_signature()
        self._fn = jax.jit(lambda p, s, x: net._test_fn(p, s, x))

    def _ensure_current_trace(self):
        from dorknet_tpu.config import trace_signature

        if trace_signature() != self._sig:
            self._rebuild_for_policy()

    def _rebuild_for_policy(self):
        self._build_jit()

    def refresh(self):
        """Re-capture params/state after further training of the SOURCE network
        (re-folds when the runner was built with fold_bn=True)."""
        if self._fold:
            from dorknet_tpu.utils.fold_bn import fold_batch_norms

            self.network = fold_batch_norms(self._source)
            self._build_jit()
        self._params = self.network.gather_params()
        self._states = self.network.gather_states()

    def _run_fixed(self, X):
        self._ensure_current_trace()
        if self.batch_sharding is not None:
            X = jax.device_put(X, self.batch_sharding)
        return self._fn(self._params, self._states, X)

    def predict_probs(self, X):
        """X: (N, C, H, W) any N — padded internally to full batches of the
        compiled shape; returns (N, num_classes) numpy softmax scores."""
        X = np.asarray(X, dtype=np.float32)
        N = X.shape[0]
        B = self.batch_size
        if N == 0:
            # np.concatenate([]) raises; dispatch one all-zero batch through
            # the compiled program (compiling it is work a later call needs
            # anyway) and slice to the empty result with the right width
            probs = np.asarray(self._run_fixed(
                jnp.zeros((B,) + X.shape[1:], jnp.float32)))
            return probs[:0]
        outs = []
        for i in range(0, N, B):
            chunk, pad = self._pad_to_batch(X[i:i + B])
            probs = np.asarray(self._run_fixed(jnp.asarray(chunk)))
            outs.append(probs[:-pad] if pad else probs)
        return np.concatenate(outs, axis=0)

    def predict(self, X):
        """Top-1 class ids, (N,) int."""
        return self.predict_probs(X).argmax(axis=1)

    def _pad_to_batch(self, X):
        n = X.shape[0]
        if n > self.batch_size:
            raise ValueError(
                "batch of {} exceeds the compiled batch_size {} — use "
                "predict_probs for arbitrary N (it chunks)".format(
                    n, self.batch_size))
        if n == self.batch_size:
            return X, 0
        pad = self.batch_size - n
        return np.concatenate(
            [X, np.zeros((pad,) + X.shape[1:], np.float32)]), pad

    def predict_iter(self, batches):
        """Stream (X, ...) batches (e.g. a loader's pull_batch); yields
        (probs, *rest) per batch, pipelining the host→device transfer. Ragged
        batches are padded to the compiled shape (no recompiles)."""
        from dorknet_tpu.data_loading.prefetch import device_prefetch

        def padded():
            for b in batches:
                X, pad = self._pad_to_batch(np.asarray(b[0], np.float32))
                yield (X, pad) + tuple(b[1:])

        self._ensure_current_trace()
        for batch in device_prefetch(padded(), size=2,
                                     sharding=self.batch_sharding):
            X, pad = batch[0], batch[1]
            probs = np.asarray(self._fn(self._params, self._states, X))
            if pad:
                probs = probs[:-pad]
            yield (probs,) + tuple(batch[2:])

    # one method serves both runners: QuantizedInferenceRunner subclasses
    # InferenceRunner and keeps the same (_params, _states, X) -> probs _fn
    # contract, so its int8 program exports identically
    def export_program(self, input_hw, channels=3, path=None, platforms=None,
                       polymorphic_batch=False):
        """Serialize THE serving program — the same fixed-shape test-mode
        forward ``_run_fixed`` compiles — as a portable ``jax.export``
        artifact (versioned StableHLO with the current params/running stats
        baked in as constants). This is the deployment story the reference
        lacks entirely (its serving path is the in-process eval loop,
        reference: network/feed_forward_network.py:72-88): ship one file to
        the serving fleet, reload it with ``load_serving_program`` with no
        model code, and it keeps running across framework versions.

        input_hw: spatial size the program is specialised to (fixed-shape
        serving contract). platforms: jax.export platform list, default the
        current backend — pass ["tpu"] to cross-compile a TPU artifact from
        a CPU host. polymorphic_batch=True exports with a symbolic batch
        dimension instead of the runner's compiled batch — one artifact
        serves any batch size (each concrete size still compiles once at
        the destination). Returns the bytes; also writes ``path`` when
        given, plus a ``<path>.meta.json`` sidecar (shapes / platforms /
        outputs — informational for fleet tooling, not needed to load).

        Export is single-device by design: a runner built with
        batch_sharding compiles a mesh-placed program that a standalone
        artifact cannot reproduce, so exporting one raises — build an
        unsharded runner (same network) to export."""
        if self.batch_sharding is not None:
            raise ValueError(
                "export_program: this runner was built with batch_sharding; "
                "the exported artifact would silently run unsharded. Build "
                "an unsharded InferenceRunner over the same network to "
                "export a serving program.")
        self._ensure_current_trace()
        if polymorphic_batch:
            (batch,) = jax.export.symbolic_shape("b")
        else:
            batch = self.batch_size
        X = jax.ShapeDtypeStruct(
            (batch, channels) + tuple(int(d) for d in input_hw),
            jnp.float32)
        params, states = self._params, self._states
        fn = self._fn

        exported = jax.export.export(
            jax.jit(lambda x: fn(params, states, x)),
            platforms=list(platforms) if platforms else None)(X)
        blob = exported.serialize()
        if path is not None:
            with open(path, "wb") as f:
                f.write(blob)
            meta = {
                "format": "jax.export/stablehlo",
                "input_shape": [None if polymorphic_batch
                                else int(self.batch_size),
                                int(channels)] + [int(d) for d in input_hw],
                "input_dtype": "float32",
                "output_avals": [
                    {"shape": [None if jax.export.is_symbolic_dim(d)
                               else int(d) for d in a.shape],
                     "dtype": str(a.dtype)}
                    for a in exported.out_avals],
                "platforms": list(exported.platforms),
                "polymorphic_batch": bool(polymorphic_batch),
                "runner": type(self).__name__,
            }
            import json

            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f, indent=2)
        return blob


def load_serving_program(path_or_bytes):
    """Reload a program written by ``InferenceRunner.export_program`` as a
    plain callable ``(B, C, H, W) float32 -> (B, num_classes) probs``. Only
    jax is needed at serving time — not this package, the model zoo or the
    checkpoint machinery (the weights are baked into the artifact)."""
    blob = path_or_bytes
    if not isinstance(blob, (bytes, bytearray)):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return jax.jit(exported.call)


class ServingArtifact:
    """A reloaded ``export_program`` artifact with the live runners' host
    conveniences: arbitrary-N ``predict_probs`` (padding + chunking to the
    compiled batch, the same protocol as ``InferenceRunner.predict_probs``
    and the reference eval loop it mirrors — reference
    network/feed_forward_network.py:72-88) and shape introspection. No
    framework state — just the compiled calling convention.

    Polymorphic artifacts chunk ``predict_probs`` inputs to ``max_batch``
    device rows per dispatch (no padding needed — the batch dim is symbolic):
    one eval-sized input must neither OOM the device as a single giant batch
    nor compile a fresh program per distinct N. Each chunk size still
    compiles once at the destination; a steady serving load sees at most two
    sizes (max_batch + one remainder)."""

    def __init__(self, exported, max_batch=256):
        self._exported = exported
        # jit the reloaded callable once: un-jitted exported.call rebuilds
        # its wrapper per dispatch (~10x per-call host overhead vs the jit
        # cache load_serving_program uses)
        self._call = jax.jit(exported.call)
        aval = exported.in_avals[0]
        b = aval.shape[0]
        self.polymorphic_batch = bool(jax.export.is_symbolic_dim(b))
        self.batch_size = None if self.polymorphic_batch else int(b)
        self.max_batch = int(max_batch)
        self.input_shape = tuple(int(d) for d in aval.shape[1:])
        self.platforms = tuple(exported.platforms)
        out = exported.out_avals[0]
        self.num_classes = int(out.shape[-1])
        self._out_dtype = out.dtype

    def __call__(self, x):
        """Raw dispatch of one device batch (shape must match the artifact's
        calling convention; polymorphic artifacts accept any batch)."""
        return self._call(x)

    def predict_probs(self, X):
        """X: (N, C, H, W), any N — returns (N, num_classes) numpy scores."""
        X = np.asarray(X, dtype=np.float32)
        if X.shape[0] == 0:
            return np.zeros((0, self.num_classes), self._out_dtype)
        if self.polymorphic_batch:
            B = self.max_batch
            return np.concatenate(
                [np.asarray(self._call(X[i:i + B]))
                 for i in range(0, X.shape[0], B)], axis=0)
        B = self.batch_size
        outs = []
        for i in range(0, X.shape[0], B):
            chunk = X[i:i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            probs = np.asarray(self._call(chunk))
            outs.append(probs[:-pad] if pad else probs)
        return np.concatenate(outs, axis=0)

    def predict(self, X):
        """Top-1 class ids, (N,) int."""
        return self.predict_probs(X).argmax(axis=1)


def load_serving_artifact(path_or_bytes, max_batch=256):
    """Load an ``export_program`` artifact as a :class:`ServingArtifact`
    (use ``load_serving_program`` instead for the bare fixed-shape
    callable). ``max_batch`` caps per-dispatch rows for polymorphic
    artifacts' ``predict_probs``."""
    blob = path_or_bytes
    if not isinstance(blob, (bytes, bytearray)):
        with open(blob, "rb") as f:
            blob = f.read()
    return ServingArtifact(jax.export.deserialize(bytearray(blob)),
                           max_batch=max_batch)


