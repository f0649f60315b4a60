"""Sources: deterministic synthetic pages generator and fragment readers."""
