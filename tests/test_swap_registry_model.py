"""Model-based check of the io.swap_cache registry bookkeeping.

The Spark-backed tests in test_swap_cache.py prove the storage-level
contract on real frames; this one drives the REGISTRY logic through
randomized op sequences (swap / bare-drain / drain_all across two
fake sessions) against a reference model, with no JVM — so the
state-space coverage is broad and the test is milliseconds-fast.

Fake frames implement exactly the surface swap_cache touches:
``persist() -> self``, ``unpersist(bool)``, ``.sparkSession``.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fxblue_etl_spark import io as fio


class FakeSession:
    """Hashable, weakref-able stand-in for a SparkSession."""


class FakeDF:
    def __init__(self, session: FakeSession):
        self._session = session
        self.persisted = False

    def persist(self):
        self.persisted = True
        return self

    def unpersist(self, _blocking=False):
        self.persisted = False
        return self

    @property
    def sparkSession(self):
        return self._session


SLOTS = ["s1", "s2", "s3"]

op_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("swap"),
            st.sampled_from(SLOTS),
            st.integers(0, 1),  # which session
            st.integers(1, 3),  # how many frames
        ),
        st.tuples(st.just("bare_drain"), st.sampled_from(SLOTS)),
        st.tuples(st.just("drain_session"), st.integers(0, 1)),
        st.tuples(st.just("drain_all")),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(ops=op_strategy)
def test_registry_matches_model(ops):
    sessions = [FakeSession(), FakeSession()]
    # model: (session index, slot) -> list of live FakeDFs
    model: dict[tuple[int, str], list[FakeDF]] = {}
    all_frames: list[FakeDF] = []

    for op in ops:
        if op[0] == "swap":
            _, slot, si, n = op
            dfs = [FakeDF(sessions[si]) for _ in range(n)]
            all_frames.extend(dfs)
            out = fio.swap_cache(slot, *dfs)
            got = [out] if n == 1 else list(out)
            assert got == dfs
            model[(si, slot)] = dfs
        elif op[0] == "bare_drain":
            _, slot = op
            fio.swap_cache(slot)
            for si in (0, 1):
                model.pop((si, slot), None)
        elif op[0] == "drain_session":
            _, si = op
            fio.drain_all(sessions[si])
            for key in [k for k in model if k[0] == si]:
                model.pop(key)
        else:
            fio.drain_all()
            model.clear()

        live = {id(df) for dfs in model.values() for df in dfs}
        for df in all_frames:
            assert df.persisted == (id(df) in live), (
                f"frame persisted={df.persisted} but model says "
                f"{'live' if id(df) in live else 'released'} after {op}"
            )

    fio.drain_all()  # leave no fake sessions behind for other tests
    assert all(not df.persisted for df in all_frames)
