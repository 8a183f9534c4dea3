from .positional_encoding import (  # noqa: F401
    sinusoidal_pe,
    relative_pe,
    PositionalEncoding,
    ScaledPositionalEncoding,
    RelPositionalEncoding,
    LegacyRelPositionalEncoding,
    LearnableFourierPosEnc,
    StreamPositionalEncoding,
)
from .attention import (  # noqa: F401
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    LegacyRelPositionMultiHeadedAttention,
)
from .transformer import (  # noqa: F401
    PositionwiseFeedForward,
    MultiLayeredConv1d,
    Conv1dLinear,
    EncoderLayer,
    Encoder,
    DecoderLayer,
    Decoder,
    Conv2dSubsampling,
    Conv2dSubsampling2,
    Conv2dSubsampling6,
    Conv2dSubsampling8,
)
from .conformer import ConformerEncoder, ConformerEncoderLayer, ConvolutionModule  # noqa: F401
from .pre_postnets import Prenet, Postnet  # noqa: F401
from .duration_predictor import DurationPredictor  # noqa: F401
from .flows import StochasticDurationPredictor  # noqa: F401
from .alignment import AlignmentModule  # noqa: F401
