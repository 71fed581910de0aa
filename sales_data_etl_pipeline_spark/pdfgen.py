"""Dependency-free PDF writer: vector text/rect/line primitives on A4.

The report sink (S9) needs a real PDF artifact; this container has no
reportlab/matplotlib, so the writer speaks the PDF 1.4 object model
directly — built-in Helvetica (WinAnsiEncoding covers the report's
Portuguese accents), uncompressed content streams (tiny output, and
greppable in tests), one content stream per page.

Only driver-side report rendering uses this; nothing here touches Spark.
"""

from __future__ import annotations

A4 = (595.28, 841.89)

# Helvetica advance widths (per mille of font size) for word wrap and
# label centering. Full AFM fidelity is unnecessary — bucket by glyph
# class; accented vowels inherit their base vowel's width.
_NARROW = set("iljtf.,;:'|!I()[]")
_WIDE = set("mwMW@%")
_CAPS = set("ABCDEFGHJKLNOPQRSUVXYZÀÁÂÃÇÉÊÍÓÔÕÚ")


def text_width(s: str, size: float) -> float:
    w = 0.0
    for ch in s:
        if ch in _NARROW:
            w += 0.28
        elif ch in _WIDE:
            w += 0.89
        elif ch in _CAPS:
            w += 0.70
        elif ch == " ":
            w += 0.28
        else:
            w += 0.52
    return w * size


def _esc(s: str) -> str:
    out = s.encode("latin-1", "replace").decode("latin-1")
    return out.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PdfCanvas:
    """Multi-page canvas; coordinates are PDF points, origin bottom-left."""

    def __init__(self, pagesize: tuple[float, float] = A4) -> None:
        self.pagesize = pagesize
        self.pages: list[list[str]] = []
        self.new_page()

    def new_page(self) -> None:
        self.pages.append([])

    def _op(self, s: str) -> None:
        self.pages[-1].append(s)

    def text(
        self,
        x: float,
        y: float,
        s: str,
        *,
        size: float = 10,
        bold: bool = False,
        color: tuple[float, float, float] = (0, 0, 0),
        angle_deg: float = 0.0,
    ) -> None:
        font = "/F2" if bold else "/F1"
        r, g, b = color
        if angle_deg:
            import math

            c = math.cos(math.radians(angle_deg))
            n = math.sin(math.radians(angle_deg))
            tm = f"{c:.4f} {n:.4f} {-n:.4f} {c:.4f} {x:.2f} {y:.2f} Tm"
        else:
            tm = f"1 0 0 1 {x:.2f} {y:.2f} Tm"
        self._op(
            f"BT {r:.3f} {g:.3f} {b:.3f} rg {font} {size:.1f} Tf {tm} "
            f"({_esc(s)}) Tj ET"
        )

    def rect(
        self,
        x: float,
        y: float,
        w: float,
        h: float,
        *,
        fill: tuple[float, float, float] | None = None,
        stroke: tuple[float, float, float] | None = (0, 0, 0),
        line_width: float = 1.0,
    ) -> None:
        ops = []
        mode = ""
        if fill is not None:
            ops.append(f"{fill[0]:.3f} {fill[1]:.3f} {fill[2]:.3f} rg")
            mode += "f"
        if stroke is not None:
            ops.append(
                f"{stroke[0]:.3f} {stroke[1]:.3f} {stroke[2]:.3f} RG "
                f"{line_width:.2f} w"
            )
            mode = "B" if fill is not None else "S"
        ops.append(f"{x:.2f} {y:.2f} {w:.2f} {h:.2f} re {mode}")
        self._op(" ".join(ops))

    def line(
        self,
        x1: float,
        y1: float,
        x2: float,
        y2: float,
        *,
        color: tuple[float, float, float] = (0, 0, 0),
        line_width: float = 1.0,
    ) -> None:
        r, g, b = color
        self._op(
            f"{r:.3f} {g:.3f} {b:.3f} RG {line_width:.2f} w "
            f"{x1:.2f} {y1:.2f} m {x2:.2f} {y2:.2f} l S"
        )

    def polyline(
        self,
        points: list[tuple[float, float]],
        *,
        color: tuple[float, float, float] = (0, 0, 0),
        line_width: float = 1.5,
    ) -> None:
        if len(points) < 2:
            return
        r, g, b = color
        path = f"{points[0][0]:.2f} {points[0][1]:.2f} m " + " ".join(
            f"{x:.2f} {y:.2f} l" for x, y in points[1:]
        )
        self._op(f"{r:.3f} {g:.3f} {b:.3f} RG {line_width:.2f} w {path} S")

    def save(self, path: str) -> str:
        W, H = self.pagesize
        n_pages = len(self.pages)
        # object layout: 1 catalog, 2 pages, 3 F1, 4 F2, then per page
        # (page obj, content obj)
        objs: list[bytes] = []
        page_ids = [5 + 2 * i for i in range(n_pages)]
        kids = " ".join(f"{pid} 0 R" for pid in page_ids)
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
        )
        for fid, name in ((3, "Helvetica"), (4, "Helvetica-Bold")):
            objs.append(
                f"<< /Type /Font /Subtype /Type1 /BaseFont /{name} "
                f"/Encoding /WinAnsiEncoding >>".encode()
            )
        for i, ops in enumerate(self.pages):
            content = "\n".join(ops).encode("latin-1", "replace")
            objs.append(
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {W} {H}] "
                f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
                f"/Contents {page_ids[i] + 1} 0 R >>".encode()
            )
            objs.append(
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        with open(path, "wb") as fh:
            fh.write(bytes(out))
        return path
