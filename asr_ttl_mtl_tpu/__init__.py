"""asr_ttl_mtl_tpu — a TPU-native (JAX/XLA/Pallas) speech framework.

Re-designed-from-scratch equivalent of the reference `muhkemallgp/asr-ttl-mtl`
system: the full Whisper inference stack (audio frontend, encoder-decoder,
greedy/beam decoding with logit filters, long-form transcription, word-level
timestamps) plus the multi-task speech-disorder fine-tuning stack (disease
tokenizer, MTL trainer, metrics, checkpointing) — built TPU-first on
jax/pjit/pallas rather than torch/CUDA.
"""

__version__ = "0.1.0"

from . import audio  # noqa: F401
from .audio import load_audio, log_mel_spectrogram, pad_or_trim  # noqa: F401
from .decoding import DecodingOptions, DecodingResult, decode, detect_language  # noqa: F401
from .models import ModelDimensions, WhisperModel, available_models, load_model  # noqa: F401
from .models.registry import from_random  # noqa: F401
from .transcribe import transcribe, transcribe_batch  # noqa: F401
