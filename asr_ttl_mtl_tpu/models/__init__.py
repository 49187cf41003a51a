from .dims import ModelDimensions, PRESET_DIMS  # noqa: F401
from .registry import (  # noqa: F401
    WhisperModel,
    available_models,
    convert_torch_state_dict,
    export_torch_state_dict,
    from_random,
    load_model,
)
from . import whisper  # noqa: F401
