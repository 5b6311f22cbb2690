from .workflow import analyze_tr, Params, LocusResult, Allele

__all__ = ["analyze_tr", "Params", "LocusResult", "Allele"]
