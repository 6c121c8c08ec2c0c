"""Arrow-vectorized wrappers for the HTML extraction spec.

No per-row Python UDFs anywhere: everything goes through pandas_udf /
mapInPandas (Arrow batch transfer). The scalar kernel is
``importpipeline_spark.html.htmltext`` — the faithful port of
HtmlProcessor.GetText (/root/reference/ImportPipeline/Html/HtmlProcessor.cs).
"""

from __future__ import annotations

import traceback
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

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


_SAFE_TYPE = StructType(
    [StructField("text", StringType()), StructField("error", StringType())]
)


@F.pandas_udf(_SAFE_TYPE)
def html_to_text_safe_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Quarantining variant: extraction failures land in an ``error`` field
    instead of failing the job — the per-record errorhandler semantics of the
    reference (Actions/PipelineErrorAction.cs:52-78; error records
    Endpoints/ESEndpoint.cs:457-471)."""
    for s in batches:
        texts, errors = [], []
        for v in s:
            try:
                if v is None:
                    texts.append(None)
                    errors.append(None)
                    continue
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", errors="replace")
                texts.append(html_to_text(v))
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine by design
                texts.append(None)
                errors.append(
                    f"{type(e).__name__}: {e} | "
                    + traceback.format_exc(limit=2).replace("\n", " ")
                )
        yield pd.DataFrame({"text": texts, "error": errors})


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
