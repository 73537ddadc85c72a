"""simplans — filled in as the build progresses (see SURVEY.md §7)."""

SPECS: list = []
