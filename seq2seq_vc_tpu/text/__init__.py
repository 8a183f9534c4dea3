from .cleaner import TextCleaner  # noqa: F401
from .tokenizers import (  # noqa: F401
    AbsTokenizer,
    CharTokenizer,
    PhonemeTokenizer,
    WordTokenizer,
    build_tokenizer,
)
from .token_id_converter import TokenIDConverter  # noqa: F401
