"""Layer base class: the reference's stateful object API over a functional core.

The reference contract (reference: layers/layer.py:3-46): a layer carries
``learned_params`` / ``non_learned_params`` / ``grads`` dicts, supports
``forward(X, test_mode=...)`` and ``backward(upstream_dx)`` (which stashes grads
side-effectfully into ``self.grads`` and returns only dx), ``to_gpu()`` and
``regulariser_forward()``.

Here every layer additionally implements a *pure* ``fapply(params, state, x,
train) -> (y, new_state)`` over NHWC activations. The network engine composes
those into one jitted XLA graph (the fast path). The per-layer ``forward`` /
``backward`` below exist for API compatibility and unit tests: ``forward`` jits
``fapply`` for this layer alone; ``backward`` re-derives the reference's manual
gradient formulas through ``jax.vjp`` (forward recompute — fine for the compat
path, the fused network step never calls it).

Activations cross the public API in the reference's NCHW layout and are
transposed to NHWC at the layer boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _tree_norm(tree):
    """Zero-valued scalar that depends on every leaf — keeps jax.grad happy
    when a reg-free layer's reg_loss_full is the constant 0."""
    return sum(jnp.sum(l) * 0.0 for l in jax.tree_util.tree_leaves(tree))


def to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1)) if x.ndim == 4 else x


def to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2)) if x.ndim == 4 else x


class Layer:
    def __init__(self, layer_name, *args, **kwargs):
        self.layer_name = layer_name
        self.is_on_gpu = False
        self.learned_params = None
        self.non_learned_params = None
        self.grads = None
        self.weight_regulariser = None
        self._jit_cache = {}
        self._last_input = None

    def __repr__(self):
        return "Layer of type {} didn't implement __repr__".format(
            self.__class__.__name__
        )

    # ------------------------------------------------------------------ #
    # Device placement: params live as JAX arrays placed by the runtime.
    # The reference's explicit CuPy migration (layers/layer.py:18-34)
    # dissolves into a no-op flag kept for script compatibility.
    # ------------------------------------------------------------------ #
    def to_gpu(self):
        if self.is_on_gpu:
            print("Layer {} is already on GPU, ignoring request".format(self.layer_name))
        else:
            self.is_on_gpu = True

    # ------------------------------------------------------------------ #
    # Functional protocol (overridden by subclasses)
    # ------------------------------------------------------------------ #
    def fapply(self, params, state, x, train):
        """Pure apply: x NHWC (4-D) or (N,C) (2-D). Returns (y, new_state)."""
        raise NotImplementedError

    def get_params(self):
        """Current params pytree (the learned_params dict itself — zero copy)."""
        return self.learned_params if self.learned_params is not None else {}

    def set_params(self, tree):
        if self.learned_params:
            for k in self.learned_params:
                self.learned_params[k] = tree[k]

    def set_grads(self, tree):
        if self.grads is not None and tree:
            for k in self.grads:
                self.grads[k] = tree[k]

    def get_grads(self):
        """Current grads pytree, mirroring get_params()."""
        return self.grads if self.grads is not None else {}

    def get_state(self):
        """Internal (jit-facing) state pytree. Stateless layers return {}."""
        return {}

    def set_state(self, tree):
        pass

    def reg_loss(self, params):
        """Regularisation scalar contributed by this layer (pure, traceable)."""
        if self.weight_regulariser is not None and params:
            return self.weight_regulariser.forward(params["weights"])
        return 0.0

    def reg_loss_full(self, params):
        """All regularisation terms, including ones the reference applies in
        backward but omits from the reported loss (see ResidualBlock)."""
        return self.reg_loss(params)

    # ------------------------------------------------------------------ #
    # Reference-compatible stateful API
    # ------------------------------------------------------------------ #
    def _trace_signature(self):
        """Extra static state baked into a trace (e.g. BN's initialized flag);
        participates in the per-layer jit cache key."""
        return ()

    def bn_initialized(self):
        """True unless the layer (or a nested child) carries batch-norm running
        stats that haven't seen a first training batch yet."""
        return True

    def _jit_for(self, key, fn):
        from dorknet_tpu.config import trace_signature

        # config globals are read at trace time — key on them too, or a
        # policy flip (compute dtype / pallas / precision) reuses stale traces
        key = key + self._trace_signature() + trace_signature()
        if key not in self._jit_cache:
            # fresh closure per cache entry: jax.jit's GLOBAL trace cache is
            # keyed by the wrapped callable, so jitting a shared module-level
            # fn (e.g. softmax_probs) twice under different keys would
            # silently resolve to one trace (CLAUDE.md jit rule)
            def _fresh(*a, _fn=fn):
                return _fn(*a)

            self._jit_cache[key] = jax.jit(_fresh)
        return self._jit_cache[key]

    def forward(self, X, *args, test_mode=False, **kwargs):
        X = jnp.asarray(X, dtype=jnp.float32)
        train = not test_mode
        if train:
            self._last_input = X

        def run(params, state, x):
            y, new_state = self.fapply(params, state, to_nhwc(x), train)
            return to_nchw(y), new_state

        fn = self._jit_for(("fwd", train), run)
        y, new_state = fn(self.get_params(), self.get_state(), X)
        if train:
            self.set_state(new_state)
        return y

    def backward(self, upstream_dx, *args, **kwargs):
        """Compat path: recompute forward under vjp, stash param grads
        (including the l2 term, as the reference does in each layer's backward,
        e.g. layers/convolution.py:99-100) and return dx."""
        if self._last_input is None:
            raise RuntimeError(
                "backward() called on layer '{}' before a training-mode forward()".format(
                    self.layer_name
                )
            )
        upstream_dx = jnp.asarray(upstream_dx, dtype=jnp.float32)

        def run(params, state, x, dy):
            def f(p, x_):
                y, _ = self.fapply(p, state, to_nhwc(x_), True)
                return to_nchw(y)

            _, vjp = jax.vjp(f, params, x)
            dparams, dx = vjp(dy)
            # Add every regularisation gradient this layer owns — including
            # nested children's (the reference adds them inside each child's
            # backward, e.g. layers/convolution.py:99-100 and the skip
            # projection inside ResidualBlock.backward). Autodiff of
            # reg_loss_full gives the matching zero trees for reg-free params.
            if jax.tree_util.tree_leaves(params):
                reg_grads = jax.grad(
                    lambda p: self.reg_loss_full(p) + 0.0 * _tree_norm(p))(params)
                dparams = jax.tree_util.tree_map(jnp.add, dparams, reg_grads)
            return dparams, dx

        fn = self._jit_for(("bwd",), run)
        dparams, dx = fn(self.get_params(), self.get_state(), self._last_input, upstream_dx)
        self.set_grads(dparams)
        return dx

    def regulariser_forward(self):
        out = 0
        if self.weight_regulariser:
            out += self.weight_regulariser.forward(self.learned_params["weights"])
        return out

    # ------------------------------------------------------------------ #
    # Checkpoint protocol (overridden where the reference persists the layer)
    # ------------------------------------------------------------------ #
    def save_to_h5(self, open_f, save_grads=True):
        raise NotImplementedError

    def load_from_h5(self, open_f, load_grads=True):
        raise NotImplementedError


def init_weights(shape, initialiser, fan_in, fan_out):
    """Reference init recipes (layers/convolution.py:23-27): glorot_uniform uses
    sqrt(6/(fan_in+fan_out)) with the *channel counts* as fans (no receptive-field
    factor); "normal" is 0.01*randn. Host-side np.random so scripts stay seedable
    with np.random.seed, exactly like the reference."""
    if initialiser == "glorot_uniform":
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        w = np.random.uniform(low=-limit, high=limit, size=shape).astype(np.float32)
    elif initialiser == "normal":
        w = (0.01 * np.random.randn(*shape)).astype(np.float32)
    else:
        raise ValueError("Unknown weight_initialiser {}".format(initialiser))
    return jnp.asarray(w)
