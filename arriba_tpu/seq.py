"""DNA sequence utilities on numpy uint8 (ASCII) arrays.

Reference parity: source/assembly.hpp:9-25 (dna_to_complement,
dna_to_reverse_complement), source/annotate_protein_domains.cpp:163-189
(genetic code). Sequences are kept as ASCII uint8 arrays on the host and
re-encoded to 2-bit/one-hot tensors at the device boundary (ops/encode.py).
"""

from __future__ import annotations

import numpy as np

# complement lookup table over ASCII; unknown characters map to themselves
# except the IUPAC codes handled by the reference's dna_to_complement
COMPLEMENT_LUT = np.arange(256, dtype=np.uint8)
for a, b in [("A", "T"), ("T", "A"), ("C", "G"), ("G", "C"),
             ("a", "t"), ("t", "a"), ("c", "g"), ("g", "c"),
             ("[", "]"), ("]", "[")]:  # insertion markers flip so a
    # reverse-complemented consensus keeps well-formed brackets
    # (assembly.hpp:17-19)
    COMPLEMENT_LUT[ord(a)] = ord(b)

# 2-bit base codes (A=0 C=1 G=2 T=3, anything else = 4) for kernels
BASE_CODE_LUT = np.full(256, 4, dtype=np.uint8)
for i, base in enumerate("ACGT"):
    BASE_CODE_LUT[ord(base)] = i
    BASE_CODE_LUT[ord(base.lower())] = i


def to_array(seq: str | bytes) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return np.frombuffer(seq, dtype=np.uint8).copy()


def to_str(arr: np.ndarray) -> str:
    return arr.tobytes().decode("ascii")


def complement(arr: np.ndarray) -> np.ndarray:
    return COMPLEMENT_LUT[arr]


def reverse_complement(arr: np.ndarray) -> np.ndarray:
    """assembly.cpp:14-26."""
    return COMPLEMENT_LUT[arr][::-1]


def reverse_complement_str(seq: str) -> str:
    return to_str(reverse_complement(to_array(seq)))


# the standard genetic code (annotate_protein_domains.cpp:163-189)
CODON_TABLE = {}
_BASES = "TCAG"
_AMINO = (
    "FFLLSSSSYY**CC*W"  # TTT..TGG
    "LLLLPPPPHHQQRRRR"  # CTT..CGG
    "IIIMTTTTNNKKSSRR"  # ATT..AGG
    "VVVVAAAADDEEGGGG"  # GTT..GGG
)
for _i, _b1 in enumerate(_BASES):
    for _j, _b2 in enumerate(_BASES):
        for _k, _b3 in enumerate(_BASES):
            CODON_TABLE[_b1 + _b2 + _b3] = _AMINO[_i * 16 + _j * 4 + _k]


def dna_to_protein(dna: str) -> str:
    """Translate DNA to amino acids; incomplete/ambiguous codons map to '?'
    except gaps, following the reference's behavior."""
    protein = []
    for i in range(0, len(dna) - 2, 3):
        codon = dna[i:i + 3].upper()
        protein.append(CODON_TABLE.get(codon, "?"))
    return "".join(protein)
