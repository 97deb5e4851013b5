"""Orchestration: the quality-gate pipeline and gates-in-maintenance."""
