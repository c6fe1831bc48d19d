"""Hermetic tests for the cloud bookkeeping layer.

The exact production code paths (fsspec-generic copy/upload/discover,
exaspim_tpu/utils/cloud.py) run against local directories — no egress,
no SDK mocks; gs://, s3:// and local URLs all resolve through the same
fsspec machinery.
"""

import os

import pytest

from exaspim_tpu.utils import cloud


@pytest.fixture()
def bucket(tmp_path):
    """A local 'bucket' mirroring the reference block layout
    (reference util.py:303-329)."""
    root = tmp_path / "from_aind"
    for brain, blocks in (("brain_653158", 2), ("brain_706301", 1)):
        for b in range(blocks):
            d = root / brain / "blocks" / f"block_{b:03d}" / "input.zarr"
            d.mkdir(parents=True)
            (d / "0.0.0").write_bytes(b"\x00" * 64)
            (d / ".zarray").write_text("{}")
        (root / brain / "blocks" / "block_000" / "notes.txt").write_text(
            "hi"
        )
    return tmp_path


def test_list_files_and_filter(bucket):
    # 3 blocks x (chunk + .zarray) + 2 notes.txt
    all_files = cloud.list_files(str(bucket))
    assert len(all_files) == 8
    zarrays = cloud.list_files(str(bucket), extension=".zarray")
    assert len(zarrays) == 3 and all(f.endswith(".zarray") for f in zarrays)


def test_subprefix_discovery(bucket):
    subs = cloud.list_subprefixes(str(bucket / "from_aind"))
    assert [os.path.basename(s.rstrip("/")) for s in subs] == [
        "brain_653158", "brain_706301",
    ]
    hit = cloud.find_subprefix_with_keyword(str(bucket / "from_aind"), "706301")
    assert hit.rstrip("/").endswith("brain_706301")
    with pytest.raises(FileNotFoundError):
        cloud.find_subprefix_with_keyword(str(bucket / "from_aind"), "nope")


def test_list_block_paths(bucket):
    paths = cloud.list_block_paths(
        "653158", root=str(bucket / "from_aind")
    )
    assert len(paths) == 2
    assert all(p.rstrip("/").endswith("input.zarr") for p in paths)


def test_copy_file_and_tree(bucket, tmp_path):
    src = str(bucket / "from_aind" / "brain_706301")
    dst = str(tmp_path / "copy_dest")
    cloud.copy_tree(src, dst)
    assert cloud.is_file_in_prefix(dst, ".zarray")
    got = cloud.list_files(dst)
    assert len(got) == len(cloud.list_files(src))

    one = str(tmp_path / "one.bin")
    cloud.copy_file(got[0], one)
    assert os.path.exists(one)


def test_upload_download_roundtrip(bucket, tmp_path):
    local = tmp_path / "outgoing"
    (local / "sub").mkdir(parents=True)
    (local / "a.txt").write_text("A")
    (local / "sub" / "b.txt").write_text("B")
    dest = str(tmp_path / "uploaded")
    cloud.upload_tree(str(local), dest)
    assert cloud.exists(dest + "/sub/b.txt")

    back = tmp_path / "incoming"
    cloud.download_tree(dest, str(back))
    assert (back / "sub" / "b.txt").read_text() == "B"


def test_directory_size(bucket):
    gb = cloud.directory_size_gb(str(bucket))
    assert gb == pytest.approx((3 * 64 + 2 + 2 + 2) / (1 << 30), rel=0.5)
