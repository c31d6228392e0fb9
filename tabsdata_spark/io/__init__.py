from .catalog_io import (
    GLUE_CATALOG_CONF, HADOOP_CATALOG_CONF, IcebergCatalogDestination,
    catalog_confs,
)
from .file_io import (
    AzureAccountKeyCredentials, AzureDestination, AzureSource, FileDestination,
    FileSource, GCSDestination, GCSServiceAccountCredentials, GCSSource,
    LocalFileDestination, LocalFileSource, S3AccessKeyCredentials,
    S3Destination, S3Source,
)
from .formats import (
    AvroFormat, CSVFormat, FileFormat, LogFormat, NDJSONFormat, ORCFormat,
    ParquetFormat, XMLFormat, format_for,
)
from .plugin import DestinationPlugin, SourcePlugin
from .sql_io import (
    MariaDBDestination, MariaDBSource, MySQLDestination, MySQLSource,
    OracleDestination, OracleSource, PostgresDestination, PostgresSource,
    SQLDestination, SQLSource, substitute_params,
)
from .table_io import TableInput, TableOutput

__all__ = [
    "FileSource", "LocalFileSource", "S3Source", "AzureSource", "GCSSource",
    "FileDestination", "LocalFileDestination", "S3Destination",
    "AzureDestination", "GCSDestination", "S3AccessKeyCredentials",
    "AzureAccountKeyCredentials", "GCSServiceAccountCredentials",
    "FileFormat", "CSVFormat", "NDJSONFormat", "LogFormat", "ParquetFormat",
    "AvroFormat", "ORCFormat", "XMLFormat", "format_for", "SQLSource", "MySQLSource", "MariaDBSource",
    "PostgresSource", "OracleSource", "SQLDestination", "MySQLDestination",
    "MariaDBDestination", "PostgresDestination", "OracleDestination",
    "substitute_params", "SourcePlugin", "DestinationPlugin", "TableInput",
    "TableOutput", "IcebergCatalogDestination", "catalog_confs",
    "GLUE_CATALOG_CONF", "HADOOP_CATALOG_CONF",
]
