from .code_repo import (  # noqa: F401
    extract_import_edges,
    generate_code_repo_table,
    verify_content_sha,
    with_content_sha,
)
from .rmat import rmat_edges  # noqa: F401
from .bucketed import read_bucketed_edges, write_bucketed_edges  # noqa: F401
from .mtx import read_mtx, read_mtx_edges  # noqa: F401
