"""Request/response models for the REST query API.

Mirrors the reference's parameter surface (src/api/v1/models.py:223-505)
with pydantic v2 models. Query-string parsing is explicit (Flask hands us
strings); body models validate POSTed JSON. The response envelope matches
src/api/v1/common.py:199-236: a pandas table-schema block, records-oriented
data with ISO timestamps, and a limit/offset pagination row.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np
import pandas as pd
from pandas.io.json import build_table_schema
from pydantic import BaseModel, Field


# --------------------------------------------------------------- requests


class TagsBodyParams(BaseModel):
    """POST body carrying the tag list (models.py:346-348)."""

    tag_name: List[str]


class SqlBodyParams(BaseModel):
    """POST body for /sql/execute (models.py:334-336)."""

    sql_statement: str


class BatchRequest(BaseModel):
    """One sub-request of /events/batch (models.py:483-494)."""

    url: str
    method: str
    params: dict
    body: Optional[dict] = None


class BatchBodyParams(BaseModel):
    requests: List[BatchRequest]


_TRUE = {"true", "1", "yes", "on"}
_FALSE = {"false", "0", "no", "off", ""}


def parse_bool(raw: Any, default: bool = False) -> bool:
    if raw is None:
        return default
    if isinstance(raw, bool):
        return raw
    s = str(raw).strip().lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    raise ValueError(f"not a boolean: {raw!r}")


def parse_int(raw: Any, name: str) -> Optional[int]:
    if raw is None or raw == "":
        return None
    try:
        return int(raw)
    except (TypeError, ValueError):
        raise ValueError(f"{name} must be an integer, got {raw!r}")


def parse_float(raw: Any, name: str) -> float:
    try:
        return float(raw)
    except (TypeError, ValueError):
        raise ValueError(f"{name} must be a number, got {raw!r}")


def require(params: dict, *names: str) -> list:
    """The reference's `Query(...)` required markers (models.py:299-336):
    a missing required parameter is a 422 there, a 400 here."""
    missing = [n for n in names if params.get(n) in (None, "", [])]
    if missing:
        raise ValueError(f"missing required parameter(s): {', '.join(missing)}")
    return [params[n] for n in names]


# -------------------------------------------------------------- responses


class PaginationRow(BaseModel):
    """src/api/v1/models.py:80-84."""

    limit: Optional[int] = None
    offset: Optional[int] = None
    next: Optional[int] = None


class FieldsModel(BaseModel):
    name: str
    type: str


class FieldSchema(BaseModel):
    fields: List[FieldsModel]
    pandas_version: str = Field(default="1.4.0")


def pagination(limit: Optional[int], offset: Optional[int], rows: int) -> PaginationRow:
    """next = offset + limit exactly when the page came back full and an
    offset was given (reference common.py:158-183)."""
    if limit is None and offset is None:
        return PaginationRow()
    nxt = None
    if limit is not None and offset is not None and rows == limit:
        nxt = offset + limit
    return PaginationRow(limit=limit, offset=offset, next=nxt)


def json_envelope(
    pdf: pd.DataFrame, limit: Optional[int] = None, offset: Optional[int] = None
) -> str:
    """Render the reference's response envelope (common.py:199-216):
    {"schema": <pandas table-schema>, "data": <records>, "pagination": ...}
    assembled from pre-serialized JSON fragments so timestamp rendering is
    pandas' ISO formatting, exactly as the reference produces it."""
    # decimal-typed verb outputs (e.g. summary's decimal(10,2) casts) come
    # back as object columns of Decimal — coerce to float exactly like the
    # reference's convert_value (common.py:248-250) before serializing
    from decimal import Decimal

    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(lambda x: isinstance(x, Decimal)).any():
            pdf[c] = pdf[c].map(lambda x: float(x) if isinstance(x, Decimal) else x)
    schema = FieldSchema.model_validate(
        build_table_schema(pdf, index=False, primary_key=False)
    )
    data_json = pdf.replace({np.nan: None}).to_json(
        orient="records", date_format="iso", date_unit="ns"
    )
    return (
        '{"schema":' + schema.model_dump_json()
        + ',"data":' + data_json
        + ',"pagination":' + pagination(limit, offset, len(pdf)).model_dump_json()
        + "}"
    )
