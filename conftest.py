# Root conftest: puts the repo root on sys.path so the package imports
# without installation.
