"""Native (C++) host-side runtime components with Python fallbacks."""
