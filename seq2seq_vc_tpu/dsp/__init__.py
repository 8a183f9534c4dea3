from .mel import mel_filterbank, hz_to_mel, mel_to_hz  # noqa: F401
from .stft import stft_magnitude, hann_window, num_frames  # noqa: F401
from .features import logmelfilterbank, LogMelExtractor  # noqa: F401
from .stats import RunningStats, normalize, denormalize  # noqa: F401
