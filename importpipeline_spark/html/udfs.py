"""Arrow-vectorized wrappers for the HTML extraction spec.

No per-row Python UDFs anywhere: everything goes through pandas_udf /
mapInPandas (Arrow batch transfer). The scalar kernel is
``importpipeline_spark.html.htmltext`` — the faithful port of
HtmlProcessor.GetText (/root/reference/ImportPipeline/Html/HtmlProcessor.cs).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .htmltext import get_abstract_from_text, html_to_text


@F.pandas_udf(StringType())
def html_to_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """html binary/string → extracted text (byte-identical to the reference).

    Mirrors HtmlToTextConverter.Convert (HtmlToTextConverter.cs:41-56):
    non-HTML inputs pass through unchanged.
    """
    for s in batches:
        def one(v) -> Optional[str]:
            if v is None:
                return None
            if isinstance(v, (bytes, bytearray)):
                v = bytes(v).decode("utf-8", errors="replace")
            return html_to_text(v)

        yield s.map(one)


def make_abstract_udf(max_length: int, delta: int):
    """text → abstract/snippet (GetAbstractFromText, HtmlProcessor.cs:222-265)."""

    @F.pandas_udf(StringType())
    def abstract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda t: None
                if t is None
                else get_abstract_from_text(t, max_length, delta)
            )

    return abstract_udf
