"""Document-level UDF library: streaming-equivalent transforms."""
