"""Stub for ``numexpr`` (imported unconditionally by the reference's
batch_norm.py:2-6, but only exercised when use_express=True, which the
default paths never set)."""


def set_vml_accuracy_mode(mode):
    return None


def evaluate(expr, local_dict=None):
    raise RuntimeError("numexpr.evaluate called under the stub (use_express "
                       "paths are not supported)")
