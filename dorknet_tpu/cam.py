"""Class Activation Maps — one jitted inference call.

The reference CAM flow (examples/imagenet_dogs_225_resnet_18_depsep_CAM.py:13-89)
runs TWO full forwards per image (test-mode scores, then a train-mode forward
early-exited at the res8 tap — mutating BN running stats as a side effect) and
does the W·features projection, resize, relu and min-max normalisation on host
with cv2. Here the whole thing — both forwards (XLA CSEs the shared trunk), the
projection, bilinear upsample and normalisation — is a single jitted program,
and the tap keeps the reference's batch-stat normalisation WITHOUT the state
mutation (SURVEY §3.3 flags that side effect).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dorknet_tpu.layers.base import to_nhwc

def _classifier_weights(net, params):
    """The classifier DenseLayer's (C, num_classes) weights — the LAST
    DenseLayer in the network (the reference reads its 'dense1' head, CAM
    example :62-64). Matching is by layer class, not name: a non-Dense layer
    that happens to be called 'dense1' must not silently project garbage."""
    dense_w = None
    for l, p in zip(net.layers, params):
        if l.__class__.__name__ == "DenseLayer":
            dense_w = p["weights"]
    if dense_w is None:
        raise ValueError(
            "CAM needs a DenseLayer classifier head; network '{}' has none "
            "(layers: {})".format(
                net.name, [l.__class__.__name__ for l in net.layers]))
    return dense_w


def _prune_cam_cache(net):
    """The jit cache lives ON the network (bounded by its lifetime); entries
    for older structure versions are dropped. Single-image keys lead with the
    version int; batched/gradcam keys lead with a string marker, version
    second."""
    cache = getattr(net, "_cam_cache", None)
    if cache is None:
        cache = net._cam_cache = {}
    version_of = lambda k: k[1] if isinstance(k[0], str) else k[0]  # noqa: E731
    for k in [k for k in cache if version_of(k) != net._version]:
        del cache[k]
    return cache


def _build_cam_fn(net, top_k, terminal_layer_name, out_size):
    def fn(params, states, X):
        x = to_nhwc(X)
        # test-mode forward for class scores
        out, _, _, _, _ = net._run_layers(params, states, x, train=False)
        from dorknet_tpu.ops.loss import softmax_probs
        scores = softmax_probs(out)[0]
        # train-mode(batch-stat) forward tapped at the terminal layer, state
        # updates discarded
        _, _, _, _, tapped = net._run_layers(
            params, states, x, train=True, terminal_layer_name=terminal_layer_name)
        feats = tapped[0]  # (H, W, C)
        H, W, C = feats.shape

        top = jnp.argsort(scores)[::-1][:top_k]
        dense_w = _classifier_weights(net, params)  # (C, num_classes)
        w_sel = dense_w.T[top]  # (k, C) — k = min(top_k, num_classes)

        cam = jnp.einsum("kc,hwc->khw", w_sel, feats)
        # resize SPATIALLY only: cam.shape[0] (not top_k) — when num_classes
        # < top_k a (classes, out, out) target would bilinearly interpolate
        # ALONG THE CLASS AXIS, fabricating blended maps
        cam = jax.image.resize(cam, (cam.shape[0], out_size, out_size),
                               method="bilinear")
        cam = jnp.maximum(cam, 0)
        cam = cam - jnp.min(cam, axis=(1, 2), keepdims=True)
        mx = jnp.max(cam, axis=(1, 2), keepdims=True)
        cam = jnp.where(mx > 0, cam / mx, cam)
        return scores, top, cam

    return jax.jit(fn)


def compute_cam_scores(net, X, top_k=3, terminal_layer_name="res8", out_size=225):
    """Returns (scores (num_classes,), cams (top_k, out_size, out_size)) for a
    single image batch X of shape (1, 3, H, W). cams are relu'd and min-max
    normalised to [0, 1], ordered by descending class score."""
    # cache lives ON the network (bounded by its lifetime) and is pruned on
    # structure/BN-state changes, so dropped networks and stale traces are
    # collectable.
    from dorknet_tpu.config import trace_signature

    # the test-mode branch divides by the running stats — fail loudly on the
    # zero placeholders instead of returning NaN maps (same host-boundary
    # contract as forward(test_mode=True))
    net._require_bn_initialized("compute_cam_scores")
    key = (net._version, top_k, terminal_layer_name, out_size,
           trace_signature(),
           tuple(l._trace_signature() for l in net.layers))
    cache = _prune_cam_cache(net)
    if key not in cache:
        cache[key] = _build_cam_fn(net, top_k, terminal_layer_name, out_size)
    fn = cache[key]
    scores, top, cam = fn(net.gather_params(), net.gather_states(),
                          jnp.asarray(X, jnp.float32))
    return scores, cam


def _build_cam_batch_fn(net, top_k, terminal_layer_name, out_size):
    from dorknet_tpu.ops.loss import softmax_probs

    def one_image(params, states, x1):
        # x1 (3,H,W) -> per-image forwards with a batch of ONE, so the tap's
        # batch-stat normalisation sees only this image — exactly the
        # reference's per-image CAM semantics, vectorised by vmap.
        x = to_nhwc(x1[None])
        out, _, _, _, _ = net._run_layers(params, states, x, train=False)
        scores = softmax_probs(out)[0]
        _, _, _, _, tapped = net._run_layers(
            params, states, x, train=True,
            terminal_layer_name=terminal_layer_name)
        return scores, tapped[0]

    def fn(params, states, X):
        scores, feats = jax.vmap(one_image, in_axes=(None, None, 0))(
            params, states, X)  # (N,classes), (N,H,W,C)
        dense_w = _classifier_weights(net, params)  # (C, num_classes)
        top = jnp.argsort(scores, axis=1)[:, ::-1][:, :top_k]  # (N, top_k)
        w_sel = dense_w.T[top]  # (N, top_k, C)
        cam = jnp.einsum("nkc,nhwc->nkhw", w_sel, feats)
        N, K = cam.shape[:2]
        cam = jax.image.resize(cam, (N, K, out_size, out_size),
                               method="bilinear")
        cam = jnp.maximum(cam, 0)
        cam = cam - jnp.min(cam, axis=(2, 3), keepdims=True)
        mx = jnp.max(cam, axis=(2, 3), keepdims=True)
        cam = jnp.where(mx > 0, cam / mx, cam)
        return scores, top, cam

    return jax.jit(fn)


def compute_cam_scores_batch(net, X, top_k=3, terminal_layer_name="res8",
                             out_size=225):
    """Batched CAM: N images per dispatch, amortising the per-dispatch host
    latency that dominates single-image CAM on tunneled/remote devices.

    X (N,3,H,W). Returns (scores (N,num_classes), cams (N,top_k,S,S)), each
    image's maps ordered by its own descending class score. Tap semantics
    match the reference exactly (per-image batch statistics, no BN state
    mutation) via a vmapped batch-of-one forward."""
    from dorknet_tpu.config import trace_signature

    net._require_bn_initialized("compute_cam_scores_batch")
    key = ("batch", net._version, top_k, terminal_layer_name, out_size,
           trace_signature(),
           tuple(l._trace_signature() for l in net.layers))
    cache = _prune_cam_cache(net)
    if key not in cache:
        cache[key] = _build_cam_batch_fn(net, top_k, terminal_layer_name,
                                         out_size)
    scores, top, cam = cache[key](net.gather_params(), net.gather_states(),
                                  jnp.asarray(X, jnp.float32))
    return scores, cam


def _tap_index(net, terminal_layer_name):
    for i, l in enumerate(net.layers):
        if l.layer_name == terminal_layer_name:
            return i
    raise ValueError(
        "terminal_layer_name '{}' matches no layer (have: {})".format(
            terminal_layer_name, [l.layer_name for l in net.layers]))


def _build_gradcam_batch_fn(net, top_k, terminal_layer_name, out_size):
    from dorknet_tpu.ops.loss import softmax_probs

    tap_idx = _tap_index(net, terminal_layer_name)

    def fn(params, states, X):
        x = to_nhwc(X)
        # segment 1: trunk up to (and including) the tap, test mode
        for i in range(tap_idx + 1):
            x, _ = net.layers[i].fapply(params[i], states[i], x, False)
        feats = x  # (N, H, W, C)

        def rest(f):
            y = f
            for i in range(tap_idx + 1, len(net.layers)):
                y, _ = net.layers[i].fapply(params[i], states[i], y, False)
            return y  # (N, num_classes) pre-softmax

        out, pullback = jax.vjp(rest, feats)
        scores = softmax_probs(out)
        top = jnp.argsort(scores, axis=1)[:, ::-1][:, :top_k]  # (N, k)

        feats32 = feats.astype(jnp.float32)

        def one_k(j):
            # per-image cotangent selecting image n's OWN top-j class; test
            # mode is batchwise independent, so pullback(ct)[n] is exactly
            # d out[n, top[n, j]] / d feats[n]
            ct = jax.nn.one_hot(top[:, j], out.shape[1], dtype=out.dtype)
            dA = pullback(ct)[0].astype(jnp.float32)  # (N, H, W, C)
            alpha = jnp.mean(dA, axis=(1, 2), keepdims=True)  # (N,1,1,C)
            return jnp.sum(alpha * feats32, axis=-1)  # (N, H, W)

        cam = jnp.stack([one_k(j) for j in range(top.shape[1])], axis=1)
        N, K = cam.shape[:2]
        cam = jax.image.resize(cam, (N, K, out_size, out_size),
                               method="bilinear")
        cam = jnp.maximum(cam, 0)
        cam = cam - jnp.min(cam, axis=(2, 3), keepdims=True)
        mx = jnp.max(cam, axis=(2, 3), keepdims=True)
        cam = jnp.where(mx > 0, cam / mx, cam)
        return scores, top, cam

    return jax.jit(fn)


def compute_gradcam_scores_batch(net, X, top_k=3, terminal_layer_name="res8",
                                 out_size=225):
    """Grad-CAM (Selvaraju et al. 2017), batched, one jitted program.

    Beyond-reference extension: plain CAM (above) is only valid when the tap
    feeds GAP -> Dense directly — it projects the classifier weights onto the
    tapped maps. Grad-CAM weights each channel by the spatial mean of
    d(class score)/d(activation), which is exact for ANY tap depth and any
    head. At a pre-GAP tap of a GAP+Dense head the two coincide (the dense
    row IS that gradient, up to the 1/(H*W) factor that min-max normalisation
    cancels) — pinned by tests/test_examples_integration.py.

    Differences from ``compute_cam_scores_batch`` (which mirrors the
    reference's semantics, reference CAM example :13-32): the tap runs in
    TEST mode (running statistics — no batch-of-one statistics needed, the
    standard Grad-CAM setting) and gradients flow through the post-tap
    layers instead of reading the classifier weights.

    X (N,3,H,W). Returns (scores (N,num_classes), cams (N,top_k,S,S)) with
    each image's maps ordered by its own descending class score, relu'd and
    min-max normalised to [0,1].
    """
    from dorknet_tpu.config import trace_signature

    net._require_bn_initialized("compute_gradcam_scores_batch")
    _tap_index(net, terminal_layer_name)  # fail loudly before tracing
    key = ("gradcam", net._version, top_k, terminal_layer_name, out_size,
           trace_signature(),
           tuple(l._trace_signature() for l in net.layers))
    cache = _prune_cam_cache(net)
    if key not in cache:
        cache[key] = _build_gradcam_batch_fn(net, top_k, terminal_layer_name,
                                             out_size)
    scores, top, cam = cache[key](net.gather_params(), net.gather_states(),
                                  jnp.asarray(X, jnp.float32))
    return scores, cam


def compute_gradcam_scores(net, X, top_k=3, terminal_layer_name="res8",
                           out_size=225):
    """Single-image Grad-CAM: X (1,3,H,W) -> (scores (num_classes,),
    cams (top_k, S, S)). See compute_gradcam_scores_batch."""
    scores, cams = compute_gradcam_scores_batch(
        net, X, top_k=top_k, terminal_layer_name=terminal_layer_name,
        out_size=out_size)
    return scores[0], cams[0]


def returnCAM(feature_conv, weight_softmax, class_idx, size_upsample=(225, 225)):
    """Host-side API shim matching the reference's returnCAM signature
    (CAM example :13-32): feature_conv (1,C,H,W) numpy, weight_softmax
    (num_classes, C), class_idx iterable. Returns a list of (H,W) float arrays."""
    bz, chans, height, width = feature_conv.shape
    output_cam = []
    for idx in class_idx:
        cam = weight_softmax[idx].dot(feature_conv.reshape(chans, height * width))
        cam = cam.reshape(height, width)
        cam = np.asarray(jax.image.resize(jnp.asarray(cam), size_upsample, "bilinear"))
        cam = np.maximum(cam, 0)
        cam = cam - np.min(cam)
        if np.max(cam) > 0:
            cam = cam / np.max(cam)
        output_cam.append(cam)
    return output_cam
