from .utils import SoundType, SONORANT, OBSTRUENT, SILENCE, Metric  # noqa: F401
from .segmenter import Segmenter, segment  # noqa: F401
from .rhythm_model import RhythmModelFineGrained, RhythmModelGlobal  # noqa: F401
from .stretcher import TimeStretcherFineGrained, TimeStretcherGlobal  # noqa: F401
from .model import UrhythmicFine, UrhythmicGlobal  # noqa: F401
