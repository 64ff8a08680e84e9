"""Native (C++) host runtime components.

`decoder.cpp` implements the from-scratch PNG/PGM decode + threaded batch
ingest (built on demand into libvodecode.so; see data/native_decode.py for
the ctypes binding and build logic).
"""
