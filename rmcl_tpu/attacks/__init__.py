from rmcl_tpu.attacks.pgd import (  # noqa: F401
    make_pgd_barlowtwins,
    make_pgd_irtr,
    make_pgd_moco,
    make_pgd_nlvr2,
    make_pgd_vqa,
)
