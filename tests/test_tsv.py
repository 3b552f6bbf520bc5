import json
import os

import numpy as np
import pytest

from vitcap_tpu.data.tsv import (
    CompositeTSVFile, TSVDataset, TSVFile, TSVSplitProperty, concat_tsv_files,
    delete_tsv_files, iter_caption_to_json, reorder_tsv_keys, tsv_reader,
    tsv_writer,
)


def _write(tmp_path, name, rows):
    p = str(tmp_path / name)
    tsv_writer(rows, p)
    return p


def test_tsv_roundtrip(tmp_path):
    rows = [["k%d" % i, json.dumps({"v": i})] for i in range(17)]
    p = _write(tmp_path, "a.tsv", rows)
    assert os.path.isfile(p)
    assert os.path.isfile(str(tmp_path / "a.lineidx"))
    assert os.path.isfile(str(tmp_path / "a.lineidx.8b"))
    t = TSVFile(p)
    assert len(t) == 17
    assert t.seek(5) == rows[5]
    assert t.seek_first_column(11) == "k11"
    assert list(t) == rows


def test_lineidx_8b_binary_compat(tmp_path):
    # the .8b sidecar must be little-endian u64 byte offsets
    rows = [["a", "bb"], ["c", "dddd"]]
    p = _write(tmp_path, "b.tsv", rows)
    offs = np.fromfile(str(tmp_path / "b.lineidx.8b"), dtype="<u8")
    with open(p, "rb") as fp:
        data = fp.read()
    lines = data.split(b"\n")[:-1]
    expect = [0]
    for line in lines[:-1]:
        expect.append(expect[-1] + len(line) + 1)
    assert offs.tolist() == expect


def test_tsv_regenerates_missing_index(tmp_path):
    p = str(tmp_path / "c.tsv")
    with open(p, "w") as fp:
        fp.write("x\t1\ny\t2\n")
    t = TSVFile(p)
    assert len(t) == 2
    assert t.seek(1) == ["y", "2"]


def test_composite_tsv(tmp_path):
    p0 = _write(tmp_path, "s0.tsv", [["a", "0"], ["b", "1"]])
    p1 = _write(tmp_path, "s1.tsv", [["c", "2"]])
    comp = CompositeTSVFile(["s0.tsv", "s1.tsv"],
                            [(1, 0), (0, 1), (0, 0)], root=str(tmp_path))
    assert len(comp) == 3
    assert comp[0] == ["c", "2"]
    assert comp[1] == ["b", "1"]


def test_concat_reorder_delete(tmp_path):
    p0 = _write(tmp_path, "x0.tsv", [["a", "0"], ["b", "1"]])
    p1 = _write(tmp_path, "x1.tsv", [["c", "2"], ["a", "dup"]])
    out = str(tmp_path / "merged.tsv")
    concat_tsv_files([p0, p1], out)
    assert len(TSVFile(out)) == 4
    final = str(tmp_path / "final.tsv")
    reorder_tsv_keys(out, ["a", "b", "c"], final)
    got = list(tsv_reader(final))
    # de-dup: last occurrence of 'a' wins; order follows requested keys
    assert got == [["a", "dup"], ["b", "1"], ["c", "2"]]
    delete_tsv_files([p0, p1])
    assert not os.path.exists(p0)
    assert not os.path.exists(str(tmp_path / "x0.lineidx.8b"))


def test_dataset_naming(tmp_path):
    ds = TSVDataset("coco", data_root=str(tmp_path))
    assert ds.get_data("train").endswith("coco/train.tsv")
    assert ds.get_data("test", "label", 2).endswith("coco/test.label.v2.tsv")
    assert ds.get_data("test", "label", 0).endswith("coco/test.label.tsv")
    tsv_writer([["k", "v"]], ds.get_data("train", "caption"))
    assert ds.has("train", "caption")
    sp = TSVSplitProperty("coco", "train", "caption", data_root=str(tmp_path))
    assert sp[0] == ["k", "v"]
    with pytest.raises(FileNotFoundError):
        TSVSplitProperty("coco", "test", data_root=str(tmp_path))


def test_iter_caption_to_json(tmp_path):
    rows = [["img1", json.dumps([{"caption": "a cat"}, {"caption": "a dog"}])],
            ["img2", json.dumps([{"caption": "hi"}])]]
    out = str(tmp_path / "gt.json")
    iter_caption_to_json(rows, out)
    got = json.load(open(out))
    assert len(got["images"]) == 2
    assert len(got["annotations"]) == 3
    assert got["annotations"][0]["caption"] == "a cat"


def test_native_lineidx_matches_python(tmp_path):
    """native/tsvtools.cpp .lineidx.8b builder == Python scan, and TSVFile
    random access works from the natively built index."""
    from vitcap_tpu.data import tsv as T
    from vitcap_tpu.data.native_tsv import build_lineidx_8b
    rows = [["k%d" % i, "payload\tcol%d" % i] for i in range(257)]
    p = tmp_path / "t.tsv"
    with open(p, "w") as f:
        for r in rows:
            f.write("\t".join(r) + "\n")
    # python reference offsets
    T.generate_lineidx(str(p), str(tmp_path / "ref.lineidx"))
    import numpy as np
    ref = np.loadtxt(tmp_path / "ref.lineidx", dtype=np.int64, ndmin=1)
    n = build_lineidx_8b(str(p), str(tmp_path / "t.lineidx.8b"))
    if n is None:
        import pytest
        pytest.skip("no g++ toolchain")
    assert n == len(rows)
    got = np.fromfile(tmp_path / "t.lineidx.8b", dtype="<u8")
    np.testing.assert_array_equal(got.astype(np.int64), ref)
    tf = T.TSVFile(str(p), generate_index=False)
    assert tf[0][0] == "k0"
    assert tf[256][0] == "k256"
    assert len(tf) == 257


def test_tsvfile_autobuilds_native_index(tmp_path):
    """TSVFile._ensure_offsets prefers the native 8b builder."""
    from vitcap_tpu.data.tsv import TSVFile
    p = tmp_path / "auto.tsv"
    with open(p, "w") as f:
        for i in range(10):
            f.write(f"key{i}\tv{i}\n")
    tf = TSVFile(str(p))
    assert tf[3] == ["key3", "v3"]
    # one of the sidecars must exist now
    import os.path as op
    assert op.isfile(str(tmp_path / "auto.lineidx.8b")) \
        or op.isfile(str(tmp_path / "auto.lineidx"))
