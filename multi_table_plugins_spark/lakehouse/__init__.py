from .fileio import FileIO, GenericFileIO, LocalFileIO, get_fileio  # noqa: F401
from .table import CommitConflict, LakeTable  # noqa: F401
from .rollup import refresh_rollup, rollup_read, rollup_schema  # noqa: F401
