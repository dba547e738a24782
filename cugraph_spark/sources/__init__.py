from .code_repo import (  # noqa: F401
    extract_import_edges,
    generate_code_repo_table,
    verify_content_sha,
    with_content_sha,
)
from .rmat import rmat_edges  # noqa: F401
