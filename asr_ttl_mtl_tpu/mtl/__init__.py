from .config import DISORDER_TYPE, TrainingConfig  # noqa: F401
from .dataset import DataLoader, MultiTaskSpeechDataset, build_mtl_tokenizer, collate  # noqa: F401
from .trainer import MultiTaskTrainer  # noqa: F401
from . import metrics  # noqa: F401
