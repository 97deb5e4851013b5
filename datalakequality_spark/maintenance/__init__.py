"""Table maintenance: compaction, clustering, MERGE INTO, expiration, lineage."""
