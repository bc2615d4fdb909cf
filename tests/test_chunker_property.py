"""Property-based equivalence: the optimized chunker must be byte-equal to
the reference loop for ARBITRARY string frames and budgets (hypothesis)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from qs_spark.kernels.sheet_kernel import chunk_frame, chunk_frame_reference

cell = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(st.lists(cell, min_size=2, max_size=4), min_size=1, max_size=60).filter(
        lambda rs: len({len(r) for r in rs}) == 1
    ),
    budget=st.integers(min_value=15, max_value=3000),
)
def test_fast_chunker_property(rows, budget):
    df = pd.DataFrame(rows, columns=[f"c{i}" for i in range(len(rows[0]))])
    try:
        fast = chunk_frame(df, budget)
    except ValueError:
        try:
            chunk_frame_reference(df, budget)
            raise AssertionError("fast raised, reference did not")
        except ValueError:
            return
    assert fast == chunk_frame_reference(df, budget)
