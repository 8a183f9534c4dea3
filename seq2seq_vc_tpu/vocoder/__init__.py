from .griffin_lim import Spectrogram2Waveform, griffin_lim, logmel2linear  # noqa: F401
from .s3prl_feat2wav import S3PRL_Feat2Wav  # noqa: F401
from .vocoder import Vocoder, get_vocoder  # noqa: F401
