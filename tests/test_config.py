import os

import pytest
import yaml

from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.easydict import EasyDict as edict, to_plain_dict


def test_parse_arguments_types():
    opt = options.parse_arguments(
        ["--a.b=3", "--a.c=0.5", "--flag", "--noflag!", "--s=hello",
         "--lst=[1,2]", "--none="])
    assert opt.a.b == 3 and isinstance(opt.a.b, int)
    assert opt.a.c == 0.5
    assert opt.flag is True
    assert opt.noflag is False
    assert opt.s == "hello"
    assert opt.lst == [1, 2]
    assert opt.none is None


def test_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    child = tmp_path / "child.yaml"
    parent.write_text("a: 1\nb:\n    c: 2\n    d: 3\n")
    child.write_text(f"_parent_: {parent}\nb:\n    c: 9\n")
    opt = options.load_options(str(child))
    assert opt.a == 1
    assert opt.b.c == 9
    assert opt.b.d == 3


def test_override_unknown_key_raises():
    base = edict(a=1, b=edict(c=2))
    with pytest.raises(KeyError):
        options.override_options(base, edict(b=edict(zzz=1)),
                                 key_stack=[], safe_check=True)


def test_override_known_key():
    base = edict(a=1, b=edict(c=2))
    out = options.override_options(base, edict(b=edict(c=7)),
                                   key_stack=[], safe_check=True)
    assert out.b.c == 7


def test_default_config_loads(base_opt):
    assert base_opt.batch_size == 12
    assert base_opt.arch.impl_sdf.n_channels == 64
    assert base_opt.render.n_samples_uniform == 64
    assert base_opt.loss_weight.category_reg is None


def test_easydict_roundtrip():
    d = edict(a=1, b=dict(c=[dict(d=2)]))
    assert d.b.c[0].d == 2
    plain = to_plain_dict(d)
    assert yaml.safe_load(yaml.safe_dump(plain)) == plain
    d2 = d.deepcopy()
    d2.b.c[0].d = 5
    assert d.b.c[0].d == 2
