"""Loss registry, resolved by name from the YAML ``criterions`` block
(reference ``bin/vc_train.py:397-405``)."""

from .seq2seq import Seq2SeqLoss  # noqa: F401
from .l1 import L1Loss  # noqa: F401
from .duration import DurationPredictorLoss, StochasticDurationPredictorLoss  # noqa: F401
from .forward_sum import ForwardSumLoss  # noqa: F401
from .guided_attention import GuidedAttentionLoss, GuidedMultiHeadAttentionLoss  # noqa: F401
from .mle import MLELoss  # noqa: F401
from .diffsinger_l2 import DiffSingerL2Loss  # noqa: F401

_CRITERIONS = {
    "Seq2SeqLoss": Seq2SeqLoss,
    "L1Loss": L1Loss,
    "DurationPredictorLoss": DurationPredictorLoss,
    "StochasticDurationPredictorLoss": StochasticDurationPredictorLoss,
    "ForwardSumLoss": ForwardSumLoss,
    "GuidedAttentionLoss": GuidedAttentionLoss,
    "GuidedMultiHeadAttentionLoss": GuidedMultiHeadAttentionLoss,
    "MLELoss": MLELoss,
    "DiffSingerL2Loss": DiffSingerL2Loss,
}


def get_criterion(name: str, **params):
    if name not in _CRITERIONS:
        raise ValueError(f"unknown criterion: {name}")
    return _CRITERIONS[name](**params)
