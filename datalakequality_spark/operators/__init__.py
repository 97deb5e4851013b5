"""Quality + pipeline operators. Each module maps a section of SURVEY.md §2."""
