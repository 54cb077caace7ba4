import json
import math

import jax.numpy as jnp
import numpy as np
import pytest

from viewformer_tpu.config import MIGTConfig, VQGANConfig, load_config, save_config
from viewformer_tpu.utils.schedules import (ConstantSchedule, CosineSchedule,
                                            LinearSchedule, Schedule, WarmupSchedule)


def test_constant_roundtrip():
    s = Schedule.from_str('1')
    assert isinstance(s, ConstantSchedule)
    assert s(0) == 1.0
    assert s(100000) == 1.0
    assert str(Schedule.from_str(str(s))) == str(s)


def test_zero_detection():
    assert Schedule.from_str('0').is_zero()
    assert not Schedule.from_str('5').is_zero()
    assert Schedule.from_str('cosine(0,0,100)').is_zero()


def test_cosine_schedule_values():
    s = Schedule.from_str('cosine(0,1,120000)')
    assert isinstance(s, CosineSchedule)
    assert s(0) == pytest.approx(0.0)
    assert s(120000) == pytest.approx(1.0)
    assert s(60000) == pytest.approx(0.5)
    # saturates past total steps
    assert s(500000) == pytest.approx(1.0)


def test_linear_schedule_values():
    s = Schedule.from_str('linear(2,4,100)')
    assert isinstance(s, LinearSchedule)
    assert s(0) == pytest.approx(2.0)
    assert s(50) == pytest.approx(3.0)
    assert s(100) == pytest.approx(4.0)
    assert s(1000) == pytest.approx(4.0)


def test_warmup_schedule():
    s = Schedule.from_str('warmup(cosine(1,0,1000),100)')
    assert isinstance(s, WarmupSchedule)
    assert s(0) == pytest.approx(0.0)
    assert s(50) == pytest.approx(0.5 * 1.0)
    assert s(100) == pytest.approx(1.0)
    assert s(1100) == pytest.approx(0.0, abs=1e-6)


def test_with_total_steps_late_binding():
    s = Schedule.from_str('cosine(0,1,)') if False else CosineSchedule(0, 1, None)
    s2 = s.with_total_steps(200)
    assert s2.num_total_steps == 200
    s3 = CosineSchedule(0, 1, 100).with_total_steps(200)
    assert s3.num_total_steps == 100  # existing value wins


def test_schedule_jax_backend():
    s = Schedule.from_str('cosine(0,1,120000)')
    t = jnp.asarray(60000.0)
    val = s(t)
    assert float(val) == pytest.approx(0.5)


def test_schedule_multiplication():
    s = 5 * Schedule.from_str('cosine(0,1,100)')
    assert s(100) == pytest.approx(5.0)
    sw = 2 * Schedule.from_str('warmup(1,10)')
    assert sw(10) == pytest.approx(2.0)


def test_config_roundtrip(tmp_path):
    cfg = MIGTConfig(n_layer=2, d_model=64, n_head=4,
                     localization_weight=Schedule.from_str('cosine(0,1,120000)'))
    save_config(cfg, str(tmp_path))
    with open(tmp_path / 'config.json') as f:
        data = json.load(f)
    assert data['model'] == 'migt'
    assert data['localization_weight'] == 'cosine(0,1,120000)'
    cfg2 = load_config(str(tmp_path))
    assert isinstance(cfg2, MIGTConfig)
    assert cfg2.n_layer == 2
    assert cfg2.localization_weight(60000) == pytest.approx(0.5)


def test_vqgan_config_stride():
    cfg = VQGANConfig()
    assert cfg.stride == 16
    assert cfg.model == 'vqgan'
    assert cfg.model_type == 'codebook'
    cfg_small = VQGANConfig(ch_mult=[1, 2, 4])
    assert cfg_small.stride == 4


def test_supported_config_dict():
    from viewformer_tpu.config import supported_config_dict
    configs = supported_config_dict()
    assert 'migt' in configs and 'vqgan' in configs
