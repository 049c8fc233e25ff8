"""Small host-side biology utilities (reference midas/utility.py:288-332
semantics: complement, reverse complement, codon translation, and
strand-aware base substitution)."""

from __future__ import annotations

CODON_TABLE = {
    "ATA": "I", "ATC": "I", "ATT": "I", "ATG": "M",
    "ACA": "T", "ACC": "T", "ACG": "T", "ACT": "T",
    "AAC": "N", "AAT": "N", "AAA": "K", "AAG": "K",
    "AGC": "S", "AGT": "S", "AGA": "R", "AGG": "R",
    "CTA": "L", "CTC": "L", "CTG": "L", "CTT": "L",
    "CCA": "P", "CCC": "P", "CCG": "P", "CCT": "P",
    "CAC": "H", "CAT": "H", "CAA": "Q", "CAG": "Q",
    "CGA": "R", "CGC": "R", "CGG": "R", "CGT": "R",
    "GTA": "V", "GTC": "V", "GTG": "V", "GTT": "V",
    "GCA": "A", "GCC": "A", "GCG": "A", "GCT": "A",
    "GAC": "D", "GAT": "D", "GAA": "E", "GAG": "E",
    "GGA": "G", "GGC": "G", "GGG": "G", "GGT": "G",
    "TCA": "S", "TCC": "S", "TCG": "S", "TCT": "S",
    "TTC": "F", "TTT": "F", "TTA": "L", "TTG": "L",
    "TAC": "Y", "TAT": "Y", "TAA": "_", "TAG": "_",
    "TGC": "C", "TGT": "C", "TGA": "_", "TGG": "W",
}

_COMP = {"A": "T", "T": "A", "G": "C", "C": "G"}


def complement(base: str) -> str:
    return _COMP.get(base, base)


def rev_comp(seq: str) -> str:
    return "".join(complement(b) for b in reversed(seq))


def translate(codon: str) -> str:
    return CODON_TABLE[str(codon)]


def index_replace(codon: str, allele: str, pos: int, strand: str) -> str:
    """Replace position `pos` of `codon` with `allele` (complemented on
    the minus strand), exactly like utility.index_replace."""
    bases = list(codon)
    bases[pos] = allele if strand == "+" else complement(allele)
    return "".join(bases)
