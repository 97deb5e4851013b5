"""Table format (IceMini), synthetic data generation, cross-run state I/O."""
