package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.FormatBytes

/** ScalaCheck properties for the format_bytes kernel (pure function —
  * no Spark session needed, so the whole space is cheap to sweep). */
object FormatBytesProps extends Properties("FormatBytes") {

  val bytesGen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 1023L),
    Gen.choose(1024L, 1048575L),
    Gen.choose(1048576L, 1073741823L),
    Gen.choose(1073741824L, 1024L * 1024 * 1024 * 1024))

  property("unit matches magnitude") = Prop.forAll(bytesGen) { n =>
    val s = FormatBytes.format(n)
    if (n < 1024L) s.endsWith(" B")
    else if (n < 1048576L) s.endsWith(" KiB")
    else if (n < 1073741824L) s.endsWith(" MiB")
    else s.endsWith(" GiB")
  }

  property("B branch is exact") = Prop.forAll(Gen.choose(0L, 1023L)) { n =>
    FormatBytes.format(n) == s"$n B"
  }

  property("rounded value is within half a tenth of the true ratio") =
    Prop.forAll(Gen.choose(1024L, 1024L * 1024 * 1024 * 1024)) { n =>
      val s = FormatBytes.format(n)
      val unit = s.split(' ')(1) match {
        case "KiB" => 1024d
        case "MiB" => 1024d * 1024
        case "GiB" => 1024d * 1024 * 1024
      }
      val rendered = s.split(' ')(0).toDouble
      math.abs(rendered - n / unit) <= 0.05 + 1e-9
    }

  property("one decimal digit always present above B") =
    Prop.forAll(Gen.choose(1024L, Long.MaxValue / 16)) { n =>
      FormatBytes.format(n).matches("\\d+\\.\\d [KMG]iB")
    }
}
