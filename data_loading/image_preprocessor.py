"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from data_loading.image_preprocessor import ImagePreprocessor``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.data_loading.image_preprocessor import ImagePreprocessor
