"""REST query API over the engine's time-series verbs.

The reference exposes its query SDK over HTTP (reference src/api/v1/*.py:
FastAPI routes /events/raw, /events/resample, ... backed by an ODBC
warehouse connection). Here the same route surface is a Flask (WSGI) app
backed by a SparkSession and a source catalog: each route parses the
reference's query parameters, runs the corresponding
``TimeSeriesQueryBuilder`` verb, and renders the reference's response
envelope ``{"schema": ..., "data": ..., "pagination": ...}``
(reference src/api/v1/common.py:199-236).
"""

from .app import Catalog, SourceBinding, create_app, default_catalog

__all__ = ["Catalog", "SourceBinding", "create_app", "default_catalog"]
