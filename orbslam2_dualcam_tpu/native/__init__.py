"""Native (C++) runtime components, built on demand with g++ and loaded
via ctypes.  Import `invfile` for the place-recognition inverted index; it
raises ImportError if no toolchain is available (callers fall back to the
pure-Python path)."""
