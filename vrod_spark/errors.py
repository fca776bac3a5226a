"""Engine error types, mirroring the reference's error surface.

Reference errors: database directory already exists / creation failure
(src/database/setup.rs:6-15), missing database-name flag
(src/main.rs:36-40), unrecognized command verb
(src/command/builder.rs:13-14, 77-79).
"""

from __future__ import annotations


class VrodError(Exception):
    """Base class for engine errors."""


class DatabaseExistsError(VrodError):
    """Database directory already exists (setup.rs:6-15 semantics)."""


class DatabaseNotFoundError(VrodError):
    pass


class CollectionExistsError(VrodError):
    pass


class CollectionNotFoundError(VrodError):
    pass


class UnrecognizedCommandError(VrodError):
    """Unknown verb (builder.rs:77-79 → CommandBuilderError::UnrecognizedCommand)."""


class DimensionMismatchError(VrodError):
    """Ingested vector dimension differs from the collection's declared dim.

    The reference never enforces this (dimension is only observed at
    runtime, embeddings.rs:35) — we must, or kNN scoring breaks.
    """


class CommandArgError(VrodError):
    """Missing or malformed command argument."""


class CommitConflictError(VrodError):
    """A copy-on-write rewrite raced a concurrent commit: the snapshot it
    derived from is no longer CURRENT. Re-read and retry the mutation."""
