"""Single layer-type registry for checkpoint reconstruction.

The reference hard-codes two separate name→class dispatch tables (one in
network/feed_forward_network.py:106-139, one in layers/residual_block.py:118-151)
— a divergence hazard when the zoo grows. Every layer class here registers
itself once; both the network loader and composite layers look types up in the
same table."""

LAYER_REGISTRY = {}


def register_layer(cls):
    LAYER_REGISTRY[cls.__name__] = cls
    return cls


def get_layer_class(type_name):
    try:
        return LAYER_REGISTRY[type_name]
    except KeyError:
        raise KeyError(
            "Unknown layer type {!r} in checkpoint (registered: {})".format(
                type_name, sorted(LAYER_REGISTRY))) from None
