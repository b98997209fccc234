"""Domain operators: bars, labels, dynamic labels, features, as-of joins."""
