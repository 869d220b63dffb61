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


def test_pallas_flag_resolution(monkeypatch):
    """--pallas tri-state: explicit flags win; auto follows the backend
    (fused kernels on real TPU, XLA attention elsewhere); non-BDE2VID
    models never use the kernel path."""
    from bde2vid_tpu.eval.__main__ import build_argparser, resolve_pallas

    p = build_argparser()
    assert p.parse_args([]).pallas is None
    assert p.parse_args(["--pallas"]).pallas is True
    assert p.parse_args(["--no-pallas"]).pallas is False

    # explicit beats backend
    assert resolve_pallas(True, "BDE2VID") is True
    assert resolve_pallas(False, "BDE2VID") is False
    # the kernel is BDE2VID-only regardless
    assert resolve_pallas(True, "E2VIDRecurrent") is False
    assert resolve_pallas(None, "E2VIDRecurrent") is False

    # auto: this suite runs on the CPU backend -> off
    assert resolve_pallas(None, "BDE2VID") is False

    # auto on a TPU backend -> on (monkeypatched platform)
    import jax

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    assert resolve_pallas(None, "BDE2VID") is True
