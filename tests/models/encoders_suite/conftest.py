"""
Encoder-suite options, mirroring the reference's pytest CLI
(tests/models/encoders/conftest.py:4-14: --encoder-name and --device).
The root conftest already defines the options; this package exists so
`pytest tests/models/encoders_suite --encoder-name=croco` mirrors the
reference invocation shape.
"""
