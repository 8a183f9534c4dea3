from .griffin_lim import Spectrogram2Waveform, griffin_lim, logmel2linear  # noqa: F401
from .vocoder import Vocoder, get_vocoder  # noqa: F401
