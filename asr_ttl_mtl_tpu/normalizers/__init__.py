from .basic import BasicTextNormalizer  # noqa: F401
from .english import EnglishTextNormalizer  # noqa: F401
