from .metadata import MetadataStore
from .table_store import TableStore
from .versions import TableURI, Version, VersionList, VersionRange, parse_versions

__all__ = [
    "MetadataStore", "TableStore", "TableURI", "Version", "VersionList",
    "VersionRange", "parse_versions",
]
