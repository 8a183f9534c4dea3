from .masks import (  # noqa: F401
    make_pad_mask,
    make_non_pad_mask,
    subsequent_mask,
    target_mask,
)
from .mas import viterbi_decode, monotonic_alignment_search  # noqa: F401
from .upsampling import (  # noqa: F401
    gaussian_upsampling,
    length_regulator,
    average_by_duration,
)
from .forward_sum import forward_sum_loss, beta_binomial_prior  # noqa: F401
from .attention import scaled_dot_attention  # noqa: F401
