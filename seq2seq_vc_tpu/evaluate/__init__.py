from .dtw_based import calculate_mcd_f0  # noqa: F401
from .dtw import dtw_path  # noqa: F401
from .asr import levenshtein, character_error_rate, word_error_rate  # noqa: F401
