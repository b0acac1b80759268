"""Host-side utilities: error channel, C++-compatible formatting, diagnostics."""
