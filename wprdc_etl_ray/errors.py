"""Engine error taxonomy.

Mirrors the reference's exception surface (``pipeline/exceptions.py`` in
WPRDC/wprdc-etl: InvalidConfigException, HTTPConnectorError,
IsHeaderException, DuplicateFileException, MissingStatusDatabaseError)
generalized for a CDC engine (SURVEY.md §2.1 C5).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class InvalidConfigError(EngineError):
    """Pipeline mis-configured (missing stage, bad parameter).

    Reference analog: ``InvalidConfigException`` raised by
    ``Pipeline.enforce_full_pipeline`` (wprdc-etl pipeline/pipeline.py).
    """


class ConnectorError(EngineError):
    """A source could not be opened / read.

    Reference analog: ``HTTPConnectorError`` (wprdc-etl pipeline/connectors.py).
    """


class IsHeaderError(EngineError):
    """A repeated header row was found mid-file (CSV sources).

    Reference analog: ``IsHeaderException`` (wprdc-etl pipeline/extractors.py);
    in this engine repeated header rows are filtered vectorized, and this
    error only signals strict-mode rejection.
    """


class SchemaValidationError(EngineError):
    """A batch failed validation against the declared Arrow schema.

    Reference analog: marshmallow ``ValidationError`` raised by
    ``schema.load`` in ``Pipeline.load_line`` (wprdc-etl pipeline/pipeline.py).
    """


class SchemaEvolutionError(EngineError):
    """Incompatible schema change (type narrowing, column removal)."""


class DuplicateCommitSkipped(EngineError):
    """A (partition, epoch) manifest commit was replayed; the commit is a no-op.

    Reference analog: ``DuplicateFileException`` raised when an input's md5
    checksum matches a prior successful run (wprdc-etl pipeline/pipeline.py
    ``Pipeline.run``) — generalized from file granularity to event-offset
    granularity (SURVEY.md §2.1 C3).
    """


class WatermarkRegressionError(EngineError):
    """A commit attempted to move a partition watermark backwards."""


class MissingManifestError(EngineError):
    """Table root has no manifest where one is required.

    Reference analog: ``MissingStatusDatabaseError`` (wprdc-etl
    pipeline/status.py).
    """


class ConcurrentCommitError(EngineError):
    """Another writer committed an epoch while this one was running;
    re-plan against the new manifest and retry (the watermark filter
    then makes the retry exactly-once)."""
