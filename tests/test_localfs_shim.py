"""Hadoop-parity tests for the local-filesystem fast path.

``storage._snap_fs`` short-circuits ``file:``/plain paths to a Python
syscall shim instead of the py4j Hadoop FileSystem. The commit protocol's
correctness rides on a handful of OBSERVABLE semantics (rename refuses an
existing destination, createNewFile is create-no-overwrite, delete returns
False on a missing path, hard-link publication raises on EEXIST). These
tests run the same operation sequence through the shim AND through the
real JVM Hadoop local FS and assert identical outcomes — so any future
Hadoop behavior the module starts relying on must be added here first."""

from __future__ import annotations

import os

import pytest

from f1_data_pipeline_spark import storage as st


def _jvm_fs(spark, path):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _both(spark, path):
    shim_fs, shim_jvm = st._PY_LOCAL_FS, st._PY_JVM
    jvm_fs, jvm = _jvm_fs(spark, path)
    return [("shim", shim_fs, shim_jvm), ("jvm", jvm_fs, jvm)]


def test_dispatch_is_local_only():
    assert st._is_local_uri("/tmp/x")
    assert st._is_local_uri("file:/tmp/x")
    assert st._is_local_uri("file:///tmp/x")
    assert not st._is_local_uri("hdfs://nn/x")
    assert not st._is_local_uri("s3a://bucket/x")


def test_snap_fs_returns_shim_for_local(spark, tmp_path):
    fs, jvm = st._snap_fs(spark, str(tmp_path))
    assert fs is st._PY_LOCAL_FS
    assert jvm is st._PY_JVM


@pytest.mark.parametrize("scheme", ["", "file:"])
def test_core_semantics_parity(spark, tmp_path, scheme):
    """Same op sequence, same observable results on both faces."""
    results = {}
    for label, fs, jvm in _both(spark, str(tmp_path)):
        root = f"{scheme}{tmp_path}/{label}"
        P = jvm.org.apache.hadoop.fs.Path
        seq = []

        d = P(f"{root}/dir")
        seq.append(("mkdirs", bool(fs.mkdirs(d))))
        seq.append(("exists-dir", bool(fs.exists(d))))
        seq.append(("exists-missing", bool(fs.exists(P(f"{root}/nope")))))

        fpath = P(f"{root}/dir/a.txt")
        out = fs.create(fpath, True)
        out.write(bytearray(b"payload"))
        out.close()
        seq.append(("exists-file", bool(fs.exists(fpath))))

        # createNewFile: True first, False when present
        nf = P(f"{root}/dir/claim")
        seq.append(("createNewFile-1", bool(fs.createNewFile(nf))))
        seq.append(("createNewFile-2", bool(fs.createNewFile(nf))))

        # read back through the IOUtils face
        stream = fs.open(fpath)
        try:
            seq.append(
                ("read", str(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")))
            )
        finally:
            stream.close()

        # listStatus: names, kinds, lengths
        listed = sorted(
            (str(s.getPath().getName()), bool(s.isDirectory()), int(s.getLen()))
            for s in fs.listStatus(P(f"{root}/dir"))
        )
        # dir length is FS-specific — normalize to 0 for the comparison
        listed = [(n, d_, 0 if d_ else ln) for (n, d_, ln) in listed]
        seq.append(("listStatus", listed))

        # rename: fresh OK, existing-destination refused. (Missing SOURCE
        # is deliberately not in the parity sequence: Hadoop's local FS
        # raises FileNotFoundException there while the shim returns False
        # — no call site ever renames a path it didn't just write, and
        # both behaviors make the `if not fs.rename(...)` cleanup paths
        # safe; the shim's arm is pinned below.)
        seq.append(("rename-fresh", bool(fs.rename(fpath, P(f"{root}/dir/b.txt")))))
        fs.create(P(f"{root}/dir/c.txt"), True).close()
        seq.append(
            ("rename-existing-dst", bool(fs.rename(P(f"{root}/dir/b.txt"), P(f"{root}/dir/c.txt"))))
        )

        # delete: file True, missing False, recursive dir True
        seq.append(("delete-file", bool(fs.delete(P(f"{root}/dir/c.txt"), False))))
        seq.append(("delete-missing", bool(fs.delete(P(f"{root}/dir/c.txt"), False))))
        seq.append(("delete-recursive", bool(fs.delete(d, True))))
        seq.append(("exists-after-delete", bool(fs.exists(d))))

        results[label] = seq

    assert results["shim"] == results["jvm"]


def test_content_summary_parity(spark, tmp_path):
    sub = tmp_path / "t"
    sub.mkdir()
    (sub / "a").write_bytes(b"x" * 100)
    (sub / "nested").mkdir()
    (sub / "nested" / "b").write_bytes(b"y" * 23)
    sizes = set()
    for _, fs, jvm in _both(spark, str(tmp_path)):
        p = jvm.org.apache.hadoop.fs.Path(str(sub))
        sizes.add(int(fs.getContentSummary(p).getLength()))
    assert sizes == {123}


def test_path_surface_parity(spark):
    for _, _, jvm in _both(spark, "/tmp"):
        P = jvm.org.apache.hadoop.fs.Path
        p = P("file:/tmp/tbl/_manifests/3.json")
        assert str(p.toUri().getScheme()) == "file"
        assert str(p.toUri().getPath()) == "/tmp/tbl/_manifests/3.json"
        assert str(p.getName()) == "3.json"
        assert str(p.getParent().getName()) == "_manifests"
        plain = P("/tmp/tbl")
        assert plain.toUri().getScheme() is None
        assert str(plain.getName()) == "tbl"


def test_hardlink_publish_eexist(tmp_path):
    """The shim's createLink must raise when the destination exists —
    that exception IS the lost-race signal in `_commit_record`."""
    src = tmp_path / "payload.tmp"
    src.write_bytes(b"{}")
    dst = tmp_path / "1.json"
    Files = st._PY_JVM.java.nio.file.Files
    File = st._PY_JVM.java.io.File
    Files.createLink(File(str(dst)).toPath(), File(str(src)).toPath())
    assert dst.read_bytes() == b"{}"
    with pytest.raises(Exception):
        Files.createLink(File(str(dst)).toPath(), File(str(src)).toPath())


def test_shim_rename_missing_source_returns_false(tmp_path):
    assert st._PY_LOCAL_FS.rename(str(tmp_path / "gone"), str(tmp_path / "d")) is False


def test_create_no_overwrite_raises_on_existing(tmp_path):
    p = tmp_path / "rec.json"
    p.write_bytes(b"old")
    with pytest.raises(Exception):
        st._PY_LOCAL_FS.create(str(p), False)
    assert p.read_bytes() == b"old"
