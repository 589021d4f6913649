import pytest

from prosim_tpu.config import get_config, get_default_config


def test_defaults_build():
    cfg = get_config()
    assert cfg.MODEL.HIDDEN_DIM == 128
    assert cfg.ROLLOUT.POLICY.REPLAN_FREQ == 10
    assert cfg.is_frozen()


def test_pred_vel_fixup_appends_velocity_elements():
    cfg = get_config()
    # demo architecture predicts velocity -> target elements gain xd, yd
    assert cfg.DATASET.FORMAT.TARGET.ELEMENTS == "x,y,h,xd,yd"


def test_fixup_without_pred_vel():
    cfg = get_config(opts=["MODEL.POLICY.ACT_DECODER.TRAJ.PRED_VEL", "False"])
    assert cfg.DATASET.FORMAT.TARGET.ELEMENTS == "x,y,h"


def test_merge_from_list_and_types():
    cfg = get_config(opts=["MODEL.HIDDEN_DIM", "64", "TRAIN.LR", "0.001"])
    assert cfg.MODEL.HIDDEN_DIM == 64
    assert cfg.TRAIN.LR == pytest.approx(1e-3)


def test_frozen_rejects_mutation():
    cfg = get_config()
    with pytest.raises(AttributeError):
        cfg.MODEL.HIDDEN_DIM = 3


def test_unknown_key_rejected():
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_yaml_merge(tmp_path):
    yaml_file = tmp_path / "exp.yaml"
    yaml_file.write_text("MODEL:\n  HIDDEN_DIM: 256\nTRAIN:\n  BATCH_SIZE: 4\n")
    cfg = get_config(str(yaml_file))
    assert cfg.MODEL.HIDDEN_DIM == 256
    assert cfg.TRAIN.BATCH_SIZE == 4


def test_cond_set_config():
    """Condition-set override yamls (reference: trainer.py:35-49)."""
    from prosim_tpu.config import get_cond_set_config, get_config

    cfg = get_config()
    un = get_cond_set_config(cfg, "uncondition")
    assert list(un.PROMPT.CONDITION.TYPES) == []
    assert un.PROMPT.CONDITION.SAMPLE_MODE.VAL == "none"
    base = get_cond_set_config(cfg, "base")
    assert "goal" in base.PROMPT.CONDITION.TYPES
    assert base.PROMPT.CONDITION.SAMPLE_RATE == 0.25
    assert base.is_frozen()
    # untouched keys survive
    assert base.MODEL.HIDDEN_DIM == cfg.MODEL.HIDDEN_DIM


def test_float_key_accepts_scientific_notation_string():
    """yaml.safe_load('3e-4') yields a STRING (YAML 1.1 wants '3.0e-4');
    float-typed keys must still accept the common CLI spelling."""
    from prosim_tpu.config import get_config

    cfg = get_config(opts=["TRAIN.LR", "3e-4"])
    assert cfg.TRAIN.LR == 3e-4
    import pytest

    with pytest.raises(TypeError):
        get_config(opts=["TRAIN.LR", "not_a_number"])
