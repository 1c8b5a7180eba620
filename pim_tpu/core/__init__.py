"""Core framework shell: config, commands, console, profiling, time, RNG.

Replaces the reference's layers 0-4 and 6 (SURVEY.md §1): platform/time/RNG/
memory/threading collapse into the JAX runtime; the cvar/cmd/console tier is
host-side Python with identical semantics.
"""
