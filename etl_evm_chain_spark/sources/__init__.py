"""Sources & sinks: EVM raw-log decode plane, config, CSV/JDBC sinks."""
