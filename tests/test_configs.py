"""Every shipped egs config must construct its model and resolve its
trainer/collater/criterion names (catches conf<->code drift without
training). Overlay configs (fine-tune --additional-config files) are
validated for YAML well-formedness only."""

import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFS = sorted(
    p for p in glob.glob(os.path.join(REPO, "egs", "*", "*", "conf", "*.yaml"))
    if "exp_synth" not in p
)


@pytest.mark.parametrize("path", CONFS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_constructs(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    assert isinstance(config, dict) and config

    if "model_type" not in config:
        # f0 tables and fine-tune overlays
        if os.path.basename(path) == "f0.yaml":
            vals = config if "f0min" in config else next(iter(config.values()))
            assert 0 < vals["f0min"] < vals["f0max"]
        return

    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import get_model_class

    model_class = get_model_class(config["model_type"])
    params = dict(config["model_params"])
    if "idim" not in params:
        params["idim"] = 100  # TTS models get idim from the token list
    model = model_class(**params)
    assert model.idim > 0 and model.odim > 0

    for name, params in (config.get("criterions") or {}).items():
        get_criterion(name, **(params or {}))

    import seq2seq_vc_tpu.train as train_mod
    import seq2seq_vc_tpu.train.data as data_mod
    import seq2seq_vc_tpu.train.tts_data as tts_data_mod

    for key in ("trainer_type", "collater_type"):
        if key in config:
            name = config[key]
            assert any(
                hasattr(m, name) for m in (train_mod, data_mod, tts_data_mod)
            ), f"{key}={name}"
