"""Batch normalisation layer.

Parity with the reference BatchNormLayer (layers/batch_norm.py:9-232):

* gamma/beta stored in broadcast shape — (1,C,1,1) when input_dimension=4,
  (C,) when 2 (reference :36-43); grads carry the same shape;
* running **std** (not var) EMA with momentum ``run_momentum`` (default 0.95),
  eps=1e-5 inside the sqrt, and the first training batch initialises the running
  stats directly (reference :76-89) — reproduced here via a static
  "initialized" trace flag;
* h5 schema: layer_info attrs (input_dimension, run_momentum, incoming_chans,
  eps) + gamma/beta/running_mean/running_std datasets (reference :176-232).

The compute is a fused XLA expression (``ops.norm``); the reference's Cython
two-pass stats kernel (layers/batch_norm_stats_cy.pyx:17-47) and numexpr
elementwise path dissolve into the jitted graph.
"""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer
from dorknet_tpu.ops.norm import batch_norm_train, batch_norm_inference
from dorknet_tpu.utils import h5io


@register_layer
class BatchNormLayer(Layer):
    def __init__(self, layer_name, input_dimension=4,
                 incoming_chans=None, run_momentum=0.95, is_on_gpu=True):
        super().__init__(layer_name)
        self.eps = 1e-5
        self.input_dimension = input_dimension
        self.non_learned_params = {"running_mean": None, "running_std": None}
        self.run_momentum = run_momentum
        if self.input_dimension not in {2, 4}:
            raise ValueError("BatchNorm input_dimension should have length 2 or 4...")
        # av_axis is reference-carryover (layers/batch_norm.py:34) kept for
        # attr parity only — the jitted compute derives axes from x.ndim in
        # ops/norm.py and never reads it
        self.av_axis = (0, 2, 3) if self.input_dimension == 4 else 0
        self.incoming_chans = incoming_chans
        if incoming_chans is not None:
            gamma = jnp.ones(incoming_chans, dtype=jnp.float32)
            beta = jnp.zeros(incoming_chans, dtype=jnp.float32)
            if self.input_dimension == 4:
                gamma = gamma.reshape(1, -1, 1, 1)
                beta = beta.reshape(1, -1, 1, 1)
            self.learned_params = {"gamma": gamma, "beta": beta}
            self.grads = {"gamma": jnp.zeros_like(gamma),
                          "beta": jnp.zeros_like(beta)}
        else:
            self.learned_params = {}
            self.grads = {}

    def __repr__(self):
        return "BatchNormLayer({}, input_dimension={}, incoming_chans={}, run_momentum={})".format(
            self.layer_name, self.input_dimension, self.incoming_chans, self.run_momentum)

    # -- functional protocol ------------------------------------------------ #
    def bn_initialized(self):
        return self.non_learned_params["running_mean"] is not None

    def _trace_signature(self):
        return (self.bn_initialized(),)

    def _num_chans(self):
        if self.incoming_chans is not None:
            return int(self.incoming_chans)
        return int(np.asarray(self.learned_params["gamma"]).size)

    def _state_shape(self):
        # the reference's broadcast storage shape ((1,C,1,1) for 4-D input,
        # (C,) for 2-D — reference: layers/batch_norm.py:70-73)
        C = self._num_chans()
        return (1, C, 1, 1) if self.input_dimension == 4 else (C,)

    def get_state(self):
        """Running stats in their stored broadcast shape; zeros placeholders
        before the first training step (ignored under initialized=False).

        NB: returned AS stored and reshaped only INSIDE the jitted graph —
        gather/scatter must not dispatch eager per-layer reshape ops (profiled
        at ~0.8 ms of host time each through the TPU tunnel)."""
        rm = self.non_learned_params["running_mean"]
        rs = self.non_learned_params["running_std"]
        if rm is None:
            z = jnp.zeros(self._state_shape(), dtype=jnp.float32)
            return {"running_mean": z, "running_std": z}
        return {"running_mean": rm, "running_std": rs}

    def set_state(self, tree):
        # plain assignment — fapply already emitted the broadcast shape
        self.non_learned_params["running_mean"] = tree["running_mean"]
        self.non_learned_params["running_std"] = tree["running_std"]

    def fapply(self, params, state, x, train):
        gamma = params["gamma"].reshape(-1)
        beta = params["beta"].reshape(-1)
        shape = self._state_shape()
        if train:
            y, new_mean, new_std = batch_norm_train(
                x, gamma, beta,
                state["running_mean"].reshape(-1), state["running_std"].reshape(-1),
                momentum=self.run_momentum, eps=self.eps,
                initialized=self.bn_initialized())
            return y, {"running_mean": new_mean.reshape(shape),
                       "running_std": new_std.reshape(shape)}
        y = batch_norm_inference(x, gamma, beta,
                                 state["running_mean"].reshape(-1),
                                 state["running_std"].reshape(-1))
        return y, state

    # -- checkpointing ------------------------------------------------------ #
    def save_to_h5(self, open_f, save_grads=True):
        if self.non_learned_params.get("running_mean") is None:
            raise ValueError(
                "BatchNormLayer '{}' has no running statistics yet — run at "
                "least one training batch (or load a checkpoint) before "
                "saving; h5py cannot store the None placeholders".format(
                    self.layer_name))
        h5io.create_layer_info(
            open_f, self.layer_name, "BatchNormLayer",
            input_dimension=self.input_dimension, run_momentum=self.run_momentum,
            incoming_chans=self.incoming_chans, eps=self.eps)
        h5io.save_array(open_f, self.layer_name + "/gamma", self.learned_params["gamma"])
        h5io.save_array(open_f, self.layer_name + "/beta", self.learned_params["beta"])
        h5io.save_array(open_f, self.layer_name + "/running_mean",
                        self.non_learned_params["running_mean"])
        h5io.save_array(open_f, self.layer_name + "/running_std",
                        self.non_learned_params["running_std"])
        if save_grads:
            h5io.save_array(open_f, self.layer_name + "/grads/gamma", self.grads["gamma"])
            h5io.save_array(open_f, self.layer_name + "/grads/beta", self.grads["beta"])

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.eps = float(info["eps"])
        self.incoming_chans = int(info["incoming_chans"])
        self.input_dimension = int(info["input_dimension"])
        self.run_momentum = float(info["run_momentum"])
        if self.input_dimension not in {2, 4}:
            raise ValueError("BatchNorm input_dimension should have length 2 or 4...")
        self.av_axis = (0, 2, 3) if self.input_dimension == 4 else 0
        self.learned_params["gamma"] = jnp.asarray(open_f[self.layer_name + "/gamma"][:])
        self.learned_params["beta"] = jnp.asarray(open_f[self.layer_name + "/beta"][:])
        self.non_learned_params["running_mean"] = jnp.asarray(
            open_f[self.layer_name + "/running_mean"][:])
        self.non_learned_params["running_std"] = jnp.asarray(
            open_f[self.layer_name + "/running_std"][:])
        if load_grads:
            self.grads["gamma"] = jnp.asarray(open_f[self.layer_name + "/grads/gamma"][:])
            self.grads["beta"] = jnp.asarray(open_f[self.layer_name + "/grads/beta"][:])
