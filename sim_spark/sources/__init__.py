"""Custom connectors: the Spark 4 Python Data Source API surface."""
