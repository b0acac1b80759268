"""Native host runtime: multithreaded C++ mpileup parser (libsidtpu).

Build with ``python -m sid_tpu.native.build`` (plain g++, no external deps);
``sid_tpu.io.native`` auto-builds on first use when g++ is available.
"""
