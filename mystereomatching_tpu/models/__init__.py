"""Model zoo: named pipeline presets.

The reference selects methods by editing static strings
(main_.cpp:15-17, e.g. "censusGrad"/"CBCA"/"sgm") and recompiling. Here
each method combination is a named, immutable :class:`MatchConfig` preset;
``get_model(name)`` returns a ready config and ``build(name, max_disp)``
a jitted pipeline.
"""

from mystereomatching_tpu.models.presets import (
    MODEL_REGISTRY,
    build,
    get_model,
    list_models,
)

__all__ = ["MODEL_REGISTRY", "get_model", "list_models", "build"]
