"""Pipeline error type. Messages mirror the reference's stderr strings so the
reference shell suites (test_hardening.sh) can grep them unchanged."""


class StegoError(RuntimeError):
    """Raised on any pipeline failure; `str(e)` matches reference stderr text."""
