"""End-to-end pipeline plans, the pandas test oracle, lineage and resume."""
