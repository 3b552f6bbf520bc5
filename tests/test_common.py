import os

import pytest

from vitcap_tpu.utils.common import (
    Config, dict_get_path_value, dict_has_path, dict_remove_path,
    dict_set_path_value, dict_update_nested, load_from_yaml_file,
    parse_general_args, worth_create, write_to_yaml_file,
)


def test_dict_paths():
    d = {}
    dict_set_path_value(d, "a$b$c", 3)
    assert d == {"a": {"b": {"c": 3}}}
    assert dict_has_path(d, "a$b$c")
    assert not dict_has_path(d, "a$b$d")
    assert dict_get_path_value(d, "a$b$c") == 3
    with pytest.raises(KeyError):
        dict_get_path_value(d, "a$x")
    assert dict_get_path_value(d, "a$x", with_default=True, default=7) == 7
    dict_remove_path(d, "a$b$c")
    assert d == {}


def test_dict_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    dict_update_nested(base, {"a": {"b": 10}, "e": 4})
    assert base == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_yaml_base_inheritance(tmp_path):
    write_to_yaml_file({"x": 1, "y": {"z": 2}}, str(tmp_path / "base.yaml"))
    write_to_yaml_file({"_base_": "base.yaml", "y": {"z": 5}, "w": 9},
                       str(tmp_path / "child.yaml"))
    got = load_from_yaml_file(str(tmp_path / "child.yaml"))
    assert got == {"x": 1, "y": {"z": 5}, "w": 9}


def test_config_layers():
    cfg = Config({"a": 1, "nest": {"k": 2}}, {"a": 10})
    assert cfg.a == 10
    assert cfg.get("nest$k") == 2
    cfg.b = 5
    assert cfg.b == 5
    with pytest.raises(AttributeError):
        _ = cfg.unknown_key
    assert cfg.get("unknown_key") is None


def test_parse_general_args(tmp_path):
    write_to_yaml_file({"param": {"lr": 1.0}, "type": "t"},
                       str(tmp_path / "c.yaml"))
    import base64
    got = parse_general_args([
        "-c", str(tmp_path / "c.yaml"),
        "-p", "param: {lr: 2.0}",
        "-bp", base64.b64encode(b"param: {bs: 8}").decode(),
    ])
    assert got["param"]["lr"] == 2.0
    assert got["param"]["bs"] == 8
    assert got["type"] == "t"


def test_worth_create(tmp_path):
    base = tmp_path / "base.txt"
    derived = tmp_path / "derived.txt"
    base.write_text("x")
    assert worth_create(str(base), str(derived))
    derived.write_text("y")
    os.utime(str(derived), (os.path.getmtime(str(base)) + 10,) * 2)
    assert not worth_create(str(base), str(derived))
    os.utime(str(derived), (os.path.getmtime(str(base)) - 10,) * 2)
    assert worth_create(str(base), str(derived))


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax backend: save/load roundtrip, pointer interop, async save."""
    import numpy as np
    from vitcap_tpu.solver.checkpointing import Checkpointer, load_state

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                        "blocks": [{"k": np.ones(4, np.float32)},
                                   {"k": np.zeros(4, np.float32)}]}}
    ck = Checkpointer(str(tmp_path / "snap"), backend="orbax")
    p = ck.save(3, state)
    assert p.endswith(".orbax")
    back = load_state(ck.last_checkpoint())
    assert int(back["iteration"]) == 3
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])
    np.testing.assert_array_equal(back["params"]["blocks"][1]["k"],
                                  np.zeros(4))
    # recover_or_load resumes from the orbax dir
    params, full, it = ck.recover_or_load(None, {"w": np.zeros((2, 3))})
    assert it == 3 and full is not None

    # async saves land after wait_until_finished
    ck2 = Checkpointer(str(tmp_path / "snap2"), backend="orbax",
                       async_save=True)
    ck2.save(1, state)
    ck2.wait_until_finished()
    back2 = load_state(ck2.last_checkpoint())
    np.testing.assert_array_equal(back2["params"]["w"], state["params"]["w"])

    # msgpack and orbax interoperate behind the same pointer file
    ck3 = Checkpointer(str(tmp_path / "snap"))   # msgpack view of same dir
    ck3.save(5, state)
    assert load_state(ck3.last_checkpoint())["iteration"] == 5


def test_nan_context_snapshot_keeps_resume_chain(tmp_path):
    """save_tagged (the NaN_context path, reference trainer.py:134-137):
    the diagnostic artifact is written but `last_checkpoint` still points
    at the last healthy snapshot, so resume never sees a post-NaN
    state."""
    import numpy as np
    import os.path as op
    from vitcap_tpu.solver.checkpointing import Checkpointer, load_state

    good = {"params": {"w": np.ones((2, 2), np.float32)}}
    bad = {"params": {"w": np.full((2, 2), np.nan, np.float32)}}
    ck = Checkpointer(str(tmp_path / "snap"))
    healthy = ck.save(10, good)
    tagged = ck.save_tagged("NaN_context_0", 17, bad)
    assert op.isfile(tagged) and "NaN_context_0" in tagged
    # the resume chain is untouched
    assert ck.last_checkpoint() == healthy
    back = load_state(ck.last_checkpoint())
    assert int(back["iteration"]) == 10
    assert np.isfinite(back["params"]["w"]).all()
    # the tagged artifact still carries the NaN state for post-mortem
    diag = load_state(tagged)
    assert int(diag["iteration"]) == 17
    assert np.isnan(diag["params"]["w"]).all()


def test_acquire_lock_and_remove_dir(tmp_path):
    """acquire_lock context manager + ensure_remove_dir (reference
    acquireLock / ensure_remove_dir)."""
    from vitcap_tpu.utils.common import acquire_lock, ensure_remove_dir
    lock = str(tmp_path / "x.LOCK")
    with acquire_lock(lock):
        assert (tmp_path / "x.LOCK").exists()
    with acquire_lock(lock):     # re-acquirable after release
        pass
    d = tmp_path / "sub"
    (d / "inner").mkdir(parents=True)
    (d / "inner" / "f.txt").write_text("x")
    ensure_remove_dir(str(d))
    assert not d.exists()
    ensure_remove_dir(str(d))    # missing-ok


def test_encoded_from_img_roundtrip():
    """encoded_from_img is the inverse of img_from_base64."""
    import numpy as np
    from vitcap_tpu.data.transforms import encoded_from_img, img_from_base64
    arr = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype("uint8")
    s = encoded_from_img(arr, fmt="PNG")      # lossless for exactness
    back = np.asarray(img_from_base64(s))
    np.testing.assert_array_equal(arr, back)


def test_packaged_assets():
    """The framework ships its own tokenizer vocab / BertConfig / vinvl
    labels (vitcap_tpu/assets), and resolve_asset remaps the reference
    YAMLs' relative ./yaml/ paths onto them from any cwd."""
    import json
    import os.path as op
    from vitcap_tpu.utils.common import asset_path, resolve_asset
    d = asset_path("VILT-L12-H784-uncased_16_384")
    assert op.isfile(op.join(d, "vocab.txt"))
    j = json.load(open(op.join(d, "config.json")))
    assert j["vocab_size"] == 30522 and j["net"] == "vit_base_patch16_384"
    assert sum(1 for _ in open(op.join(d, "vocab.txt"))) == 30522
    # remap: missing relative path -> packaged asset with same basename
    r = resolve_asset("./yaml/VILT-L12-H784-uncased_16_384")
    assert r == d
    assert resolve_asset("./yaml/vinvl_label.json").endswith(
        op.join("assets", "vinvl_label.json"))
    # existing paths pass through untouched
    assert resolve_asset(__file__) == __file__
    assert resolve_asset("./definitely/not/here.json") == \
        "./definitely/not/here.json"
