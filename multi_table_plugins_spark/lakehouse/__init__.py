from .table import CommitConflict, LakeTable  # noqa: F401
