"""Lance-path IO tests (VERDICT round-2 item #10).

The sandbox has no ``lance`` package, so the lance round-trips are
``skipif``-gated: they run green wherever lance IS installed and assert
that the Lance branch keeps the exact partition/manifest/lineage
semantics of the parquet fallback. The fallback contract itself is
asserted unconditionally so this module never goes fully dark.
"""

import pyarrow as pa
import pytest

from akf_cdparser_ray.sources import io as aio

TBL = pa.table(
    {
        "image_id": ["a", "b", "c"],
        "caption": ["x", "y", "z"],
        "n": [1, 2, 3],
    }
)


needs_lance = pytest.mark.skipif(not aio.HAVE_LANCE, reason="lance not installed")


@needs_lance
def test_lance_table_roundtrip(tmp_path):
    uri = str(tmp_path / "tbl")
    out = aio.write_table(TBL, uri)
    assert out == uri
    back = aio.read_table(uri)
    assert back.sort_by("image_id").equals(TBL.sort_by("image_id"))


@needs_lance
def test_lance_partition_roundtrip_and_manifest(tmp_path):
    root = str(tmp_path / "pairs")
    aio.write_partition(TBL, root, "wave000", lineage={"wave": 0})
    aio.write_partition(TBL.slice(0, 1), root, "wave001", lineage={"wave": 1})
    man = aio.load_manifest(root)
    assert man["partitions"]["wave000"] == {"rows": 3, "lineage": {"wave": 0}}
    assert aio.partition_done(root, "wave001")
    assert not aio.partition_done(root, "wave002")
    back = aio.read_partitions(root)
    assert back.num_rows == 4
    # overwrite (resume re-running a partition) replaces, never appends
    aio.write_partition(TBL.slice(0, 2), root, "wave001")
    assert aio.read_partitions(root).num_rows == 5


def test_parquet_fallback_roundtrip(tmp_path):
    """The no-lance branch: same API, .parquet suffix appended."""
    uri = str(tmp_path / "tbl")
    out = aio.write_table(TBL, uri)
    if not aio.HAVE_LANCE:
        assert out.endswith(".parquet")
    assert aio.read_table(uri).equals(TBL)


def test_partition_semantics_identical_without_lance(tmp_path):
    """Manifest/lineage/atomic-replace semantics hold on the fallback —
    the invariant the lance tests pin is branch-independent."""
    root = str(tmp_path / "pairs")
    aio.write_partition(TBL, root, "wave000", lineage={"wave": 0})
    assert aio.partition_done(root, "wave000")
    assert aio.read_partitions(root).num_rows == 3
    aio.write_partition(TBL.slice(0, 1), root, "wave000")
    assert aio.read_partitions(root).num_rows == 1


def _fragmented_partition(root, key, n_frags, rows_per_frag=4):
    """Build a partition of n_frags files via the distributed-write path."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    tmpdir = tempfile.mkdtemp(dir=root, prefix=f".{key}.tmp")
    total = 0
    for i in range(n_frags):
        tbl = pa.table({
            "image_id": [f"{key}-{i}-{j}" for j in range(rows_per_frag)],
            "n": list(range(total, total + rows_per_frag)),
        })
        pq.write_table(tbl, f"{tmpdir}/part-{i:03d}.parquet")
        total += rows_per_frag
    aio.finalize_partition(root, key, tmpdir, total, lineage={"wave": key})
    return total


def test_compact_partition_merges_and_preserves(tmp_path):
    root = str(tmp_path / "pairs")
    total = _fragmented_partition(root, "wave000", 5)
    before = aio.read_partitions(root).sort_by("image_id")
    stat = aio.compact_partition(root, "wave000", target_rows=1_000)
    assert stat["files_before"] == 5 and stat["files_after"] == 1
    after = aio.read_partitions(root).sort_by("image_id")
    assert after.equals(before) and after.num_rows == total
    man = aio.load_manifest(root)["partitions"]["wave000"]
    assert man["rows"] == total and man["lineage"]["compacted_from"] == 5
    assert man["lineage"]["wave"] == "wave000"  # original lineage kept
    # idempotent: a second pass is a no-op
    assert aio.compact_partition(root, "wave000", 1_000)["skipped"]


def test_compact_partition_splits_to_target(tmp_path):
    root = str(tmp_path / "pairs")
    _fragmented_partition(root, "wave000", 10, rows_per_frag=3)  # 30 rows
    stat = aio.compact_partition(root, "wave000", target_rows=8)
    assert stat["files_after"] == 4  # ceil(30/8)
    assert aio.read_partitions(root).num_rows == 30


def test_compact_partitions_distributed(tmp_path, ray_session):
    root = str(tmp_path / "pairs")
    totals = {f"wave{k:03d}": _fragmented_partition(root, f"wave{k:03d}", 4)
              for k in range(3)}
    before = aio.read_partitions(root).sort_by("image_id")
    stats = aio.compact_partitions(root, target_rows=1_000)
    assert len(stats) == 3 and all(not s["skipped"] for s in stats)
    after = aio.read_partitions(root).sort_by("image_id")
    assert after.equals(before)
    man = aio.load_manifest(root)["partitions"]
    for key, total in totals.items():
        assert man[key]["rows"] == total
        assert man[key]["lineage"]["compacted_from"] == 4


def test_compact_survives_stale_crash_tmpdir(tmp_path):
    """A compaction killed mid-write leaves a dot-prefixed tmpdir; readers
    must ignore it and a re-run must compact cleanly."""
    import os

    import pyarrow.parquet as pq

    root = str(tmp_path / "pairs")
    total = _fragmented_partition(root, "wave000", 4)
    # simulate a crashed compaction: half-written tmpdir next to the data
    stale = os.path.join(root, ".wave000.compactXYZ")
    os.makedirs(stale)
    pq.write_table(TBL, os.path.join(stale, "part-00000.parquet"))
    assert aio.read_partitions(root).num_rows == total  # stale dir ignored
    stat = aio.compact_partition(root, "wave000", target_rows=1_000)
    assert stat["files_after"] == 1
    assert aio.read_partitions(root).num_rows == total


def test_compact_recovers_mid_swap_crash(tmp_path):
    """Round-4 ADVICE regression: a compaction killed BETWEEN the
    rename-aside and the promote (partition dir absent, data in the
    aside) must not lose the partition — both read_partitions and a
    compact re-run recover it."""
    import os

    root = str(tmp_path / "pairs")
    total = _fragmented_partition(root, "wave000", 4)
    before = aio.read_partitions(root).sort_by("image_id")
    pdir = os.path.join(root, "wave000")
    # simulate the crash window: live dir renamed aside, promote never ran
    os.rename(pdir, aio._aside_path(root, "wave000"))
    assert not os.path.isdir(pdir)
    # reads recover instead of silently dropping manifest-claimed rows
    assert aio.read_partitions(root).sort_by("image_id").equals(before)
    assert os.path.isdir(pdir)
    # and a compact re-run from the same state completes cleanly
    os.rename(pdir, aio._aside_path(root, "wave000"))
    stat = aio.compact_partition(root, "wave000", target_rows=1_000)
    assert stat["files_after"] == 1 and not stat["skipped"]
    assert aio.read_partitions(root).sort_by("image_id").equals(before)
    assert aio.read_partitions(root).num_rows == total
    assert not os.path.isdir(aio._aside_path(root, "wave000"))


def test_compact_recovers_post_promote_crash(tmp_path):
    """Crash AFTER the promote but before the aside cleanup: the aside
    (superseded fragments) must be discarded, never double-read."""
    import os
    import shutil

    root = str(tmp_path / "pairs")
    total = _fragmented_partition(root, "wave000", 4)
    before = aio.read_partitions(root).sort_by("image_id")
    pdir = os.path.join(root, "wave000")
    shutil.copytree(pdir, aio._aside_path(root, "wave000"))
    assert aio.read_partitions(root).num_rows == total  # aside not double-read
    stat = aio.compact_partition(root, "wave000", target_rows=1_000)
    assert stat["files_after"] == 1
    assert aio.read_partitions(root).sort_by("image_id").equals(before)
    assert not os.path.isdir(aio._aside_path(root, "wave000"))
