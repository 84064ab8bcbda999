"""Sources/sinks: parquet catalog tables plus Xena-TSV matrix parity IO."""
