"""Config loader tests (SURVEY.md C1/C2)."""

import os

import pytest

from vqa_tpu.config import (
    deep_merge,
    dump_options,
    get_dotted,
    load_options,
    options_from_dict,
    parse_override,
    set_dotted,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPTIONS_DIR = os.path.join(REPO, "options", "vqa2")

GRADED_CONFIGS = {
    "concat_att.yaml": "ConcatAtt",
    "mlb_att.yaml": "MLBAtt",
    "mutan_att.yaml": "MutanAtt",
    "mfb_coatt.yaml": "MFBCoAtt",
    "mfh_coatt.yaml": "MFHCoAtt",
    "cor.yaml": "CoR",
}


def test_deep_merge_nested_override_wins():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = {"a": {"y": 5}, "c": 7}
    merged = deep_merge(base, over)
    assert merged == {"a": {"x": 1, "y": 5}, "b": 3, "c": 7}
    assert base["a"]["y"] == 2  # no mutation


def test_dotted_access():
    tree = {}
    set_dotted(tree, "model.seq2vec.arch", "lstm")
    assert get_dotted(tree, "model.seq2vec.arch") == "lstm"
    assert get_dotted(tree, "model.missing", "fallback") == "fallback"


def test_parse_override_yaml_typed():
    assert parse_override("optim.lr=0.01") == ("optim.lr", 0.01)
    assert parse_override("optim.batch_size=64") == ("optim.batch_size", 64)
    assert parse_override("vqa.samplingans=false") == ("vqa.samplingans", False)
    assert parse_override("model.arch=MLBAtt") == ("model.arch", "MLBAtt")


@pytest.mark.parametrize("fname,arch", sorted(GRADED_CONFIGS.items()))
def test_graded_configs_load(fname, arch):
    opt = load_options(os.path.join(OPTIONS_DIR, fname))
    assert opt.model.arch == arch
    assert opt.vqa.maxlength == 26
    assert opt.optim.batch_size == 128
    assert opt.vqa.nans in (2000, 3000)


def test_cli_overrides_beat_yaml():
    opt = load_options(
        os.path.join(OPTIONS_DIR, "mutan_att.yaml"),
        overrides=["optim.lr=0.5", "model.fusion.R=10", "vqa.nans=100"],
    )
    assert opt.optim.lr == 0.5
    assert opt.model.fusion["R"] == 10
    assert opt.vqa.nans == 100


def test_unknown_section_rejected():
    with pytest.raises(KeyError):
        options_from_dict({"nonsense": {}})
    with pytest.raises(KeyError):
        options_from_dict({"vqa": {"not_a_real_knob": 1}})


def test_scientific_notation_lr_stays_float():
    """ADVICE r1 (medium): --lr 1e-5 reprs as '1e-05', which YAML 1.1 parses
    as a *string*; the named-flag path must deliver a float regardless."""
    from vqa_tpu.cli.train import build_argparser, options_from_args

    args = build_argparser().parse_args(
        ["--path_opt", os.path.join(OPTIONS_DIR, "mutan_att.yaml"), "--lr", "1e-5"]
    )
    opt = options_from_args(args)
    assert isinstance(opt.optim.lr, float) and opt.optim.lr == 1e-5
    # the --opt string path coerces too (yaml gives back '5e-5' as str)
    opt = load_options(
        os.path.join(OPTIONS_DIR, "mutan_att.yaml"), overrides=["optim.lr=5e-5"]
    )
    assert isinstance(opt.optim.lr, float) and opt.optim.lr == 5e-5


def test_yaml_word_booleans_stay_strings_for_str_fields():
    """code-review r2: YAML 1.1 parses on/off/yes/no as booleans — the
    documented `--opt engine.pallas=on` must arrive as the string 'on'."""
    base = os.path.join(OPTIONS_DIR, "mutan_att.yaml")
    opt = load_options(base, overrides=["engine.pallas=on"])
    assert opt.engine.pallas == "on"
    opt = load_options(base, overrides=["engine.pallas=off"])
    assert opt.engine.pallas == "off"
    # literal true/false spellings still become booleans for bool fields
    opt = load_options(base, overrides=["vqa.samplingans=false"])
    assert opt.vqa.samplingans is False
    # a genuine bool into a str field errors clearly instead of 'True'
    with pytest.raises(TypeError, match="pallas"):
        load_options(base, overrides=[("engine.pallas", True)])


def test_field_type_coercion_and_errors():
    base = os.path.join(OPTIONS_DIR, "mutan_att.yaml")
    # int -> float promotion for float fields
    opt = load_options(base, overrides=[("optim.lr", 1)])
    assert isinstance(opt.optim.lr, float) and opt.optim.lr == 1.0
    # string ints coerce for int fields
    opt = load_options(base, overrides=[("optim.batch_size", "64")])
    assert opt.optim.batch_size == 64
    # garbage raises a clear TypeError at config time, not deep in optax
    with pytest.raises(TypeError, match="optim.lr"):
        load_options(base, overrides=[("optim.lr", "fast")])
    with pytest.raises(TypeError, match="batch_size"):
        load_options(base, overrides=[("optim.batch_size", "many")])


def test_dump_options_roundtrip(tmp_path):
    opt = load_options(os.path.join(OPTIONS_DIR, "mlb_att.yaml"))
    path = dump_options(opt, str(tmp_path))
    reloaded = load_options(path, default_path=None)
    assert reloaded.raw == opt.raw
