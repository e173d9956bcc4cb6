import os
import pytest

from texpose_tpu.utils.config import (
    Config, load_yaml, merge, parse_cli_overrides, set_options, save_options_file)


def test_dot_access_and_nesting():
    c = Config({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert c.a.b == 1
    assert c.c[1].d == 2
    c.a.e = {"f": 3}
    assert c.a.e.f == 3


def test_parent_merge(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    (tmp_path / "child.yaml").write_text(
        "_parent_: base.yaml\nnested:\n  y: 20\nb: 2\n")
    cfg = load_yaml(str(tmp_path / "child.yaml"))
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.nested.x == 1 and cfg.nested.y == 20


def test_cli_overrides():
    cfg = parse_cli_overrides([
        "--a.b.c=3", "--flag", "--noflag!", "--empty=", "--lst=[1,2]",
        "--s=hello", "--f=1.5e-3"])
    assert cfg.a.b.c == 3
    assert cfg.flag is True and cfg.noflag is False
    assert cfg.empty is None
    assert cfg.lst == [1, 2]
    assert cfg.s == "hello" and abs(cfg.f - 1.5e-3) < 1e-12


def test_merge_unknown_key_guard():
    base = Config({"a": 1})
    with pytest.raises(KeyError):
        merge(base, Config({"b": 2}), allow_new=False)
    out = merge(base, Config({"b": 2}), allow_new=True)
    assert out.b == 2


def test_set_options_and_snapshot(tmp_path):
    ycfg = tmp_path / "run.yaml"
    ycfg.write_text("group: g\nname: n\ndata:\n  image_size: [128, 128]\n")
    cfg = set_options(argv=[f"--yaml={ycfg}", "--data.image_size=[64,96]"])
    assert cfg.H == 64 and cfg.W == 96
    assert cfg.output_path == os.path.join("output", "g", "n")
    f = save_options_file(cfg, str(tmp_path / "out"))
    assert os.path.exists(f)
    snap = load_yaml(f)
    assert snap.data.image_size == [64, 96]


def test_seed_suffix(tmp_path):
    ycfg = tmp_path / "run.yaml"
    ycfg.write_text("group: g\nname: n\n")
    cfg = set_options(argv=[f"--yaml={ycfg}", "--seed=7"])
    assert cfg.name == "n_seed7"


def test_resolve_yaml_bare_name(tmp_path, monkeypatch):
    """--yaml accepts the reference's bare-name form (options.py:50-51:
    --yaml=nerf_lm_adapt_gan -> options/<name>.yaml; here configs/)."""
    from texpose_tpu.utils.config import resolve_yaml, set_options

    # literal paths still win
    f = tmp_path / "direct.yaml"
    f.write_text("model: m\n")
    assert resolve_yaml(str(f)) == str(f)

    # bare name resolves against ./configs in the cwd
    cdir = tmp_path / "configs"
    cdir.mkdir()
    (cdir / "tiny.yaml").write_text("model: bare\nseed: 0\n")
    monkeypatch.chdir(tmp_path)
    assert resolve_yaml("tiny").endswith(os.path.join("configs",
                                                      "tiny.yaml"))
    cfg = set_options(["--yaml=tiny", "--name=x"])
    assert cfg.model == "bare" and cfg.name == "x"

    # the shipped configs resolve from anywhere (package-relative)
    assert os.path.isfile(resolve_yaml("nerf_lm_pretrain"))

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        resolve_yaml("no_such_config")


def test_setdefault_and_update_wrap_nested_dicts():
    """C-level dict.setdefault/update bypass __setitem__ — the overrides
    must wrap nested plain dicts so dot access keeps working."""
    from texpose_tpu.utils.config import Config

    cfg = Config({"a": 1})
    got = cfg.setdefault("data", {"image_size": [480, 640]})
    assert got.image_size == [480, 640]
    assert cfg.data.image_size == [480, 640]
    assert cfg.setdefault("data", {"other": 1}).image_size == [480, 640]
    cfg.update({"render": {"light": "topk_mean"}}, seed=3)
    assert cfg.render.light == "topk_mean" and cfg.seed == 3
