"""Hopping-window counts (stages/windows.hopping_window_counts):
membership rule vs a local reference, and layout independence."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.windows import hopping_window_counts


@pytest.mark.usefixtures("ray_session")
def test_hopping_counts_match_reference_and_layout():
    import ray.data as rd

    rng = np.random.default_rng(23)
    base = pd.Timestamp("2024-01-01").value // 10**9
    secs = base + rng.integers(0, 7200, size=300)
    df = pd.DataFrame({
        "ts": pd.to_datetime(secs, unit="s"),
        "event_type": rng.choice(["a", "b"], size=300)})
    expect = {}
    for s, k in zip(secs, df["event_type"]):
        kb = s // 900
        for j in range(4):
            expect[((kb - j) * 900, k)] = expect.get(((kb - j) * 900, k),
                                                     0) + 1
    outs = []
    for n in (1, 6):
        ds = rd.from_pandas([df.iloc[i::n].reset_index(drop=True)
                             for i in range(n)])
        out = (hopping_window_counts(ds, size_s=3600, hop_s=900)
               .to_pandas().sort_values(["ws_epoch", "event_type"])
               .reset_index(drop=True))
        outs.append(out)
        got = {(int(r.ws_epoch), r.event_type): int(r.n)
               for r in out.itertuples()}
        assert got == expect
    assert outs[0].equals(outs[1])
    # every event is in exactly size/hop = 4 windows
    assert outs[0]["n"].sum() == 4 * len(df)


@pytest.mark.usefixtures("ray_session")
def test_debounce_keeps_first_of_burst_and_layout():
    import ray.data as rd

    from akf_cdparser_ray.stages.windows import debounce_events

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": range(8),
        "user_id": [1, 1, 1, 1, 1, 2, 2, 2],
        "event_type": ["a", "a", "a", "b", "a", "a", "a", "a"],
        "ts": [base, base + pd.Timedelta(seconds=100),       # burst: drop
               base + pd.Timedelta(seconds=700),   # 600s after e1: drop
               base + pd.Timedelta(seconds=50),              # type b: keep
               base + pd.Timedelta(seconds=1301),   # 601s after e2: keep
               base, base + pd.Timedelta(seconds=600),       # == gap: drop
               base + pd.Timedelta(seconds=600, microseconds=1)]})  # 600.000001s from e5 -> drop (lag vs PREVIOUS row)
    outs = []
    for n in (1, 3):
        ds = rd.from_pandas([df.iloc[i::n].reset_index(drop=True)
                             for i in range(n)])
        out = (debounce_events(ds, gap_s=600).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])
    # lag is vs the previous ROW (kept or not): e1 drops (100s), e2 drops
    # (exactly 600s after e1), e4 keeps (601s after e2); e6 drops (==gap),
    # e7 drops (1us after e6)
    assert outs[0]["event_id"].tolist() == [0, 3, 4, 5]
