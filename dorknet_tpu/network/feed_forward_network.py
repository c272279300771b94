"""FeedForwardNetwork — the reference container API over one jitted XLA graph.

The reference walks its layer list in Python, one kernel dispatch per layer per
step, gradients stashed side-effectfully, then a per-param optimiser loop
(reference: network/feed_forward_network.py:47-70, optimisers/SGDMomentum.py:31-39).
Here the whole training forward+backward is ONE compiled XLA program:
``forward(X, y, test_mode=False)`` runs a jitted ``value_and_grad`` over the
composed pure layer functions (including every l2 term), caches the grads pytree,
and ``backward()`` just distributes those grads into each layer's ``grads`` dict
(zero additional compute). Inference and terminal-name taps are separate cached
jits. Checkpoint format (h5 + json-of-reprs) is byte-compatible with the
reference (§ layers/*.py save_to_h5 / network/feed_forward_network.py:90-139).
"""

import json

import h5py
import numpy as np
import jax
import jax.numpy as jnp

import dorknet_tpu.layers  # noqa: F401 — populates the layer registry
from dorknet_tpu.layers.base import to_nhwc, to_nchw
from dorknet_tpu.layers.losses import SoftmaxWithCrossEntropy
from dorknet_tpu.layers.registry import get_layer_class


class FeedForwardNetwork:
    def __init__(self, name):
        self.name = name
        self.is_on_gpu = False
        self.layers = []
        self.loss_layer = None
        self._version = 0
        self._jit_cache = {}
        self._pending_grads = None

    def __repr__(self):
        out = "{}: \n".format(self.name)
        for l in self.layers:
            out += "\t" + l.__repr__() + "\n"
        return out

    def add_layer(self, layer):
        self.layers.append(layer)
        self._version += 1

    def set_loss_layer(self, loss_layer):
        self.loss_layer = loss_layer
        self._version += 1

    def to_gpu(self):
        """Device placement shim — params already live where XLA put them."""
        if self.is_on_gpu:
            print("Model already on GPU, ignoring request")
        else:
            for layer in self.layers:
                layer.to_gpu()
            self.is_on_gpu = True

    # ------------------------------------------------------------------ #
    # Pure step functions (composed & traced once per (mode, structure))
    # ------------------------------------------------------------------ #
    def _run_layers(self, params, states, x, train, terminal_layer_name=None,
                    layer_wrap=None):
        """Compose every layer's fapply. Returns (x_out, new_states, reported_reg,
        full_reg, tapped) where tapped is the terminal tap output (NHWC) or None.
        layer_wrap(layer, fapply) may return a transformed apply (e.g.
        jax.checkpoint for per-block rematerialisation)."""
        new_states = []
        reported_reg = 0.0
        full_reg = 0.0
        tapped = None
        for i, l in enumerate(self.layers):
            if tapped is None:
                apply = l.fapply if layer_wrap is None else layer_wrap(l, l.fapply)
                x, s = apply(params[i], states[i], x, train)
                if train:
                    reported_reg = reported_reg + l.reg_loss(params[i])
                    full_reg = full_reg + l.reg_loss_full(params[i])
                if terminal_layer_name is not None and l.layer_name == terminal_layer_name:
                    tapped = x
            else:
                s = states[i]
            new_states.append(s)
        return x, new_states, reported_reg, full_reg, tapped

    def _jit_for(self, kind, fn, **jit_kwargs):
        from dorknet_tpu.config import trace_signature

        key = (kind, self._version, trace_signature(),
               tuple(l._trace_signature() for l in self.layers))
        if key not in self._jit_cache:
            # Wrap in a fresh closure: jax.jit's global trace cache is keyed by
            # the underlying callable, so jitting the same bound method twice
            # would silently reuse a trace from a previous (e.g. BN
            # pre-initialisation) structure signature.
            def _fresh(*args, _fn=fn):
                return _fn(*args)

            self._jit_cache[key] = jax.jit(_fresh, **jit_kwargs)
        return self._jit_cache[key]

    def _train_step_fn(self, params, states, X, y_one_hot):
        """One fused fwd+bwd: returns (loss_reported, probs, new_states, grads).

        The differentiated objective is data_loss + EVERY l2 term (what the
        reference's applied gradients contain); the reported loss uses the
        reference's accounting (which skips residual-skip-projection terms)."""

        def objective(p):
            x, new_states, reported_reg, full_reg, _ = self._run_layers(
                p, states, to_nhwc(X), train=True)
            data_loss, probs = self.loss_layer.fapply_loss(x, y_one_hot)
            loss_for_grad = data_loss + full_reg
            loss_reported = data_loss + reported_reg
            return loss_for_grad, (loss_reported, probs, new_states)

        grads, (loss_reported, probs, new_states) = jax.grad(
            objective, has_aux=True)(params)
        return loss_reported, probs, new_states, grads

    def _test_fn(self, params, states, X):
        x, _, _, _, _ = self._run_layers(params, states, to_nhwc(X), train=False)
        if self.loss_layer is not None:
            from dorknet_tpu.ops.loss import softmax_probs
            return softmax_probs(x)
        return to_nchw(x)

    def _tap_fn_train(self, params, states, X, terminal):
        x, _, _, _, tapped = self._run_layers(
            params, states, to_nhwc(X), train=True, terminal_layer_name=terminal)
        return to_nchw(tapped)

    def _tap_fn_test(self, params, states, X, terminal):
        x, _, _, _, tapped = self._run_layers(
            params, states, to_nhwc(X), train=False, terminal_layer_name=terminal)
        return to_nchw(tapped)

    # ------------------------------------------------------------------ #
    # Reference-compatible API
    # ------------------------------------------------------------------ #
    def gather_params(self):
        return [l.get_params() for l in self.layers]

    def gather_states(self):
        return [l.get_state() for l in self.layers]

    def scatter_states(self, new_states):
        for l, s in zip(self.layers, new_states):
            l.set_state(s)

    def forward(self, X, y_one_hot=None, test_mode=False, terminal_layer_name=None):
        X = jnp.asarray(X, dtype=jnp.float32)
        params = self.gather_params()
        states = self.gather_states()

        if terminal_layer_name is not None:
            # Early-exit feature tap (reference :52-53). In train mode the
            # reference's tap mutates BN running stats as a side effect
            # (SURVEY §3.3); we normalise with batch stats (same numerics) but
            # do NOT write the stats back.
            if all(l.layer_name != terminal_layer_name for l in self.layers):
                raise ValueError(
                    "terminal_layer_name '{}' matches no layer (have: {})"
                    .format(terminal_layer_name,
                            [l.layer_name for l in self.layers]))
            if test_mode:
                # same host-boundary contract as the plain test-mode branch —
                # but only the trunk UP TO the tap runs (layers after it are
                # short-circuited), so only that prefix needs running stats
                idx = [l.layer_name for l in self.layers].index(
                    terminal_layer_name)
                self._require_bn_initialized("test-mode feature tap",
                                             layers=self.layers[:idx + 1])
                fn = self._jit_for(("tap_test", terminal_layer_name),
                                   lambda p, s, x: self._tap_fn_test(
                                       p, s, x, terminal_layer_name))
            else:
                fn = self._jit_for(("tap_train", terminal_layer_name),
                                   lambda p, s, x: self._tap_fn_train(
                                       p, s, x, terminal_layer_name))
            return 0, fn(params, states, X)

        if test_mode:
            self._require_bn_initialized("test-mode forward")
            fn = self._jit_for(("test",), self._test_fn)
            return 0, fn(params, states, X)

        if self.loss_layer is None:
            # Train-mode forward without a loss: run layers, update BN state,
            # return raw output (reference returns (0, X) in this case).
            def fwd(p, s, x):
                out, new_states, _, _, _ = self._run_layers(p, s, to_nhwc(x), train=True)
                return to_nchw(out), new_states

            fn = self._jit_for(("fwd_noloss",), fwd)
            out, new_states = fn(params, states, X)
            self.scatter_states(new_states)
            return 0, out

        y_one_hot = jnp.asarray(y_one_hot, dtype=jnp.float32)
        fn = self._jit_for(("train",), self._train_step_fn)
        loss, probs, new_states, grads = fn(params, states, X, y_one_hot)
        self.scatter_states(new_states)
        self._pending_grads = grads
        return loss, probs

    def backward(self):
        """Distribute the grads computed by the fused forward into each layer's
        ``grads`` dict (the reference recomputes them layer-by-layer here)."""
        if self.loss_layer is None:
            raise ValueError("Network doesn't have a loss, can't run backward pass.")
        if self._pending_grads is None:
            raise RuntimeError("backward() called before a training-mode forward()")
        for l, g in zip(self.layers, self._pending_grads):
            l.set_grads(g)
        self._pending_grads = None

    def _require_bn_initialized(self, what, layers=None):
        """Inference normalises by the RUNNING stats; before the first
        training batch those are zeros placeholders and the divide emits
        Inf/NaN silently (the reference crashes on the None arithmetic
        instead) — fail loudly at the host boundary. ``layers`` restricts the
        check to a subset (e.g. the trunk before a feature tap)."""
        layers = self.layers if layers is None else layers
        bad = [l.layer_name for l in layers if not l.bn_initialized()]
        if bad:
            raise ValueError(
                "{} needs initialised batch-norm running statistics; run a "
                "training batch or load a checkpoint first (uninitialised: "
                "{})".format(what, bad))

    def test(self, data_loader, batch_size, test_set_size):
        """Accuracy loop (reference :72-88): argmax on device, compare on host."""
        from tqdm import tqdm

        self._require_bn_initialized("test()")

        test_correct_total = 0
        params = self.gather_params()
        states = self.gather_states()

        def predict(p, s, x):
            return jnp.argmax(self._test_fn(p, s, x), axis=1)

        fn = self._jit_for(("predict",), predict)
        for X_test_batch, y_test_batch, _ in tqdm(data_loader,
                                                  total=test_set_size / batch_size):
            pred = fn(params, states, jnp.asarray(X_test_batch, dtype=jnp.float32))
            test_correct_total += np.sum(np.asarray(y_test_batch) == np.asarray(pred))
        return float(test_correct_total) / test_set_size

    # ------------------------------------------------------------------ #
    # Checkpointing (byte-compatible with the reference)
    # ------------------------------------------------------------------ #
    def save_weights_to_h5(self, fname):
        with h5py.File(fname, "w") as f:
            for layer in self.layers:
                layer.save_to_h5(f)
            if self.loss_layer is not None:
                self.loss_layer.save_to_h5(f)

    def save_layer_structure_to_json(self, fname):
        structure_dict = {"name": self.name}
        for layer in self.layers:
            structure_dict[layer.layer_name] = repr(layer)
        if self.loss_layer is not None:
            structure_dict[self.loss_layer.layer_name] = repr(self.loss_layer)
        with open(fname, "w") as f:
            json.dump(structure_dict, f, indent=4)

    def load_network_from_json_and_h5(self, json_fname, h5_fname):
        """json gives layer ORDER; the h5 'type' attr gives the class
        (reference :106-139)."""
        with open(json_fname, "r") as f:
            json_structure = json.load(f)
        with h5py.File(h5_fname, "r") as f:
            self.name = json_structure["name"]
            del json_structure["name"]
            for layer_name in json_structure.keys():
                l_type = f[layer_name + "/layer_info"].attrs["type"]
                if l_type == "SoftmaxWithCrossEntropy":
                    l = SoftmaxWithCrossEntropy(layer_name)
                    l.load_from_h5(f)
                    self.loss_layer = l
                    continue
                l = get_layer_class(l_type)(layer_name)
                l.load_from_h5(f)
                self.layers.append(l)
        self._version += 1
