"""Eval CLI helper tests."""

import os

from bde2vid_tpu.eval.__main__ import read_checkpoints, read_datafiles


def test_checkpoint_numeric_epoch_sort(tmp_path):
    for name in ("epoch_9.pth", "epoch_10.pth", "epoch_2.pth", "final.msgpack"):
        (tmp_path / name).touch()
    files = [os.path.basename(f) for f in read_checkpoints(str(tmp_path), 0, -1)]
    assert files[:3] == ["epoch_2.pth", "epoch_9.pth", "epoch_10.pth"]
    assert files[3] == "final.msgpack"


def test_checkpoint_range_slicing(tmp_path):
    for i in range(5):
        (tmp_path / f"epoch_{i}.pth").touch()
    files = read_checkpoints(str(tmp_path), 1, 3)
    assert [os.path.basename(f) for f in files] == ["epoch_1.pth", "epoch_2.pth"]


def test_read_datafiles_listing_and_walk(tmp_path):
    root = tmp_path / "h5" / "HQF"
    root.mkdir(parents=True)
    (root / "a.h5").touch()
    (root / "b.h5").touch()
    files, data_root = read_datafiles(str(tmp_path), ["HQF/"])
    assert sorted(files) == [os.path.join("HQF", "a.h5"), os.path.join("HQF", "b.h5")]
    # explicit listing wins and filters by dataset substring
    with open(tmp_path / "h5" / "eval_data.txt", "w") as fp:
        fp.write("HQF/a.h5\nMVSEC/x.h5\n")
    files, _ = read_datafiles(str(tmp_path), ["HQF/"])
    assert files == ["HQF/a.h5"]
