from .schedulers import warmup_lr_schedule, get_scheduler  # noqa: F401
from .optim import build_optimizer  # noqa: F401
from .state import TrainState  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .ar_vc import ARVCTrainer  # noqa: F401
from .aas_vc import AASVCTrainer  # noqa: F401
from .nar_vc import NARVCTrainer  # noqa: F401
from .ar_tts import ARTTSTrainer  # noqa: F401

TRAINERS = {
    "ARVCTrainer": ARVCTrainer,
    "AASVCTrainer": AASVCTrainer,
    "NARVCTrainer": NARVCTrainer,
    "ARTTSTrainer": ARTTSTrainer,
}


def get_trainer_class(name: str):
    if name not in TRAINERS:
        raise ValueError(f"unknown trainer_type: {name}")
    return TRAINERS[name]
