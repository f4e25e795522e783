"""Sources & sinks: transcript table I/O and the snapshot/lineage
checkpoint store backing mid-pipeline resume."""
