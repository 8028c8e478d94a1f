package graft.transformers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.generators.{Gen, OracleGen}

/** Shared dictionaries for the faker-family transformers
  * (ref `transformers/random_faker.go:28-216` drives go-faker; here the
  * lists are our own, the *semantics* — pick-from-dictionary / digit
  * template — are the reference's). Lists are plain Scala Seqs so the
  * Spark and DuckDB renderings are generated from one source of truth. */
object FakerData {
  val MonthNames = Seq("January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")
  val DayNames = Seq("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday")
  val Centuries = Seq("XVII", "XVIII", "XIX", "XX", "XXI")
  val Timezones = Seq("UTC", "America/New_York", "America/Chicago", "America/Los_Angeles",
    "Europe/London", "Europe/Berlin", "Europe/Paris", "Asia/Tokyo", "Asia/Shanghai",
    "Asia/Kolkata", "Australia/Sydney", "America/Sao_Paulo")
  val Tlds = Seq("com", "org", "net", "io", "dev", "info")
  val Words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november", "oscar",
    "papa", "quebec", "romeo", "sierra", "tango", "uniform", "victor",
    "whiskey", "xray", "yankee", "zulu")
  val CCTypes = Seq("VISA", "MasterCard", "American Express", "Discover", "JCB", "UnionPay")
  val Currencies = Seq("USD", "EUR", "GBP", "JPY", "CNY", "CHF", "CAD", "AUD", "SEK", "INR")
  val MaleFirst = Seq("James", "Robert", "John", "Michael", "David", "William",
    "Richard", "Joseph", "Thomas", "Charles", "Daniel", "Matthew", "Anthony",
    "Mark", "Paul", "Steven", "Andrew", "Kenneth", "George", "Joshua")
  val FemaleFirst = Seq("Mary", "Patricia", "Jennifer", "Linda", "Elizabeth",
    "Barbara", "Susan", "Jessica", "Sarah", "Karen", "Lisa", "Nancy", "Betty",
    "Margaret", "Sandra", "Ashley", "Kimberly", "Emily", "Donna", "Michelle")
  val LastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
    "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez",
    "Gonzalez", "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson",
    "Martin", "Lee", "Perez", "Thompson", "White", "Harris")
  val CompanyStems = Seq("Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
    "Wonka", "Hooli", "Vandelay", "Cyberdyne", "Tyrell", "Aperture", "Monarch",
    "Nimbus", "Quantum", "Vertex", "Zenith", "Apex", "Orbit", "Pinnacle")
  val CompanySuffixes = Seq("Inc", "LLC", "Group", "Holdings", "Labs", "Systems",
    "Industries", "Partners", "Corp", "Ltd")
  val Streets = Seq("Main St", "Oak Ave", "Maple Dr", "Cedar Ln", "Park Blvd",
    "2nd St", "Washington Ave", "Lake Rd", "Hill St", "Sunset Blvd",
    "River Rd", "Church St", "Elm St", "Highland Ave", "Mill Rd")
  val Cities = Seq("Springfield", "Riverton", "Fairview", "Kingston", "Ashland",
    "Georgetown", "Salem", "Madison", "Clinton", "Franklin", "Arlington",
    "Clayton", "Dayton", "Lexington", "Milton")
  val States = Seq("AL", "CA", "CO", "FL", "GA", "IL", "MA", "MI", "NY", "NC",
    "OH", "OR", "PA", "TX", "WA")
}

/** Pick-from-dictionary scalar — the building block of most faker funcs.
  * Hash-engine deterministic (a deliberate upgrade over the reference's
  * always-random faker family: determinism keeps FK consistency and makes
  * the oracle checkable; `random_faker.go:28` note). */
case class FakerChoice(values: Seq[String], tweak: String) extends ScalarTransformer {
  def column(in: Column) =
    element_at(array(values.map(lit): _*), Gen.pick(Gen.u60(in, tweak), values.size))
  def oracle(in: String) = Some {
    val list = values.map(v => s"'${v.replace("'", "''")}'").mkString("[", ",", "]")
    s"${list}[${OracleGen.pick(OracleGen.u60(in, tweak), values.size)}]"
  }
}

/** Digit-template scalar: `n` decimal digits derived from one u60 draw
  * (digits of u60 mod 10^n; ≤0.4% non-uniformity at n=16 — fine for fake
  * identifiers, one hash instead of n). */
case class FakerDigits(n: Int, tweak: String, prefix: String = "", suffix: String = "")
  extends ScalarTransformer {
  require(n >= 1 && n <= 16, "FakerDigits: n in [1,16]")
  private val mod = math.pow(10, n).toLong
  def column(in: Column) =
    concat(lit(prefix), lpad((Gen.u60(in, tweak) % mod).cast("string"), n, "0"), lit(suffix))
  def oracle(in: String) = Some(
    s"('${prefix}' || lpad(((${OracleGen.u60(in, tweak)}) % ${mod})::VARCHAR, ${n}, '0') || '${suffix}')")
}

/** The 22 faker scalars of `random_faker.go:28-216`, as ScalarTransformers. */
object Faker {
  import FakerData._

  def latitude: ScalarTransformer = RandomFloat(-90.0, 90.0, 5, "lat")
  def longitude: ScalarTransformer = RandomFloat(-180.0, 180.0, 5, "lon")
  def monthName: ScalarTransformer = FakerChoice(MonthNames, "month")
  def dayOfWeek: ScalarTransformer = FakerChoice(DayNames, "dow")
  def century: ScalarTransformer = FakerChoice(Centuries, "century")
  def timezone: ScalarTransformer = FakerChoice(Timezones, "tz")
  def word: ScalarTransformer = FakerChoice(Words, "word")
  def ccType: ScalarTransformer = FakerChoice(CCTypes, "cctype")
  def currency: ScalarTransformer = FakerChoice(Currencies, "curr")

  case class YearString(tweak: String = "year") extends ScalarTransformer {
    def column(in: Column) = Gen.longBetween(Gen.u60(in, tweak), 1950, 2025).cast("string")
    def oracle(in: String) =
      Some(s"(${OracleGen.longBetween(OracleGen.u60(in, tweak), 1950, 2025)})::VARCHAR")
  }
  def yearString: ScalarTransformer = YearString()

  case class DayOfMonth(tweak: String = "dom") extends ScalarTransformer {
    def column(in: Column) = Gen.longBetween(Gen.u60(in, tweak), 1, 28).cast("string")
    def oracle(in: String) =
      Some(s"(${OracleGen.longBetween(OracleGen.u60(in, tweak), 1, 28)})::VARCHAR")
  }
  def dayOfMonth: ScalarTransformer = DayOfMonth()

  case class DomainName(tweak: String = "domain") extends ScalarTransformer {
    def column(in: Column) = concat(
      FakerChoice(Words, tweak + "w").column(in), lit("."),
      FakerChoice(Tlds, tweak + "t").column(in))
    def oracle(in: String) = Some(s"(${FakerChoice(Words, tweak + "w").oracle(in).get} || '.' || " +
      s"${FakerChoice(Tlds, tweak + "t").oracle(in).get})")
  }
  def domainName: ScalarTransformer = DomainName()

  case class Url(tweak: String = "url") extends ScalarTransformer {
    private val d = DomainName(tweak + "d")
    private val p = FakerChoice(Words, tweak + "p")
    def column(in: Column) = concat(lit("https://"), d.column(in), lit("/"), p.column(in))
    def oracle(in: String) = Some(s"('https://' || ${d.oracle(in).get} || '/' || ${p.oracle(in).get})")
  }
  def url: ScalarTransformer = Url()

  case class Username(tweak: String = "user") extends ScalarTransformer {
    private val w = FakerChoice(Words, tweak + "w")
    private val dg = FakerDigits(4, tweak + "d")
    def column(in: Column) = concat(w.column(in), dg.column(in))
    def oracle(in: String) = Some(s"(${w.oracle(in).get} || ${dg.oracle(in).get})")
  }
  def username: ScalarTransformer = Username()

  def password: ScalarTransformer = RandomString(12, 16,
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789!#%+", "pw")

  case class Sentence(tweak: String = "sent", nWords: Int = 6) extends ScalarTransformer {
    def column(in: Column) = {
      val ws = (0 until nWords).map(i => FakerChoice(Words, tweak + i).column(in))
      concat(concat_ws(" ", ws: _*), lit("."))
    }
    def oracle(in: String) = Some {
      val ws = (0 until nWords).map(i => FakerChoice(Words, tweak + i).oracle(in).get)
      s"(${ws.mkString(" || ' ' || ")} || '.')"
    }
  }
  def sentence: ScalarTransformer = Sentence()

  case class Paragraph(tweak: String = "para") extends ScalarTransformer {
    private val ss = (0 until 3).map(i => Sentence(tweak + i))
    def column(in: Column) = concat_ws(" ", ss.map(_.column(in)): _*)
    def oracle(in: String) = Some(ss.map(_.oracle(in).get).mkString("(", " || ' ' || ", ")"))
  }
  def paragraph: ScalarTransformer = Paragraph()

  def ccNumber: ScalarTransformer = FakerDigits(16, "ccnum")
  def phoneNumber: ScalarTransformer = new ScalarTransformer {
    private val a = FakerDigits(3, "ph-a", "(", ") ")
    private val b = FakerDigits(3, "ph-b", "", "-")
    private val c = FakerDigits(4, "ph-c")
    def column(in: Column) = concat(a.column(in), b.column(in), c.column(in))
    def oracle(in: String) =
      Some(s"(${a.oracle(in).get} || ${b.oracle(in).get} || ${c.oracle(in).get})")
  }
  def tollFreePhoneNumber: ScalarTransformer = new ScalarTransformer {
    private val b = FakerDigits(3, "tf-b", "(800) ", "-")
    private val c = FakerDigits(4, "tf-c")
    def column(in: Column) = concat(b.column(in), c.column(in))
    def oracle(in: String) = Some(s"(${b.oracle(in).get} || ${c.oracle(in).get})")
  }
  def e164PhoneNumber: ScalarTransformer = FakerDigits(10, "e164", "+1")

  case class AmountWithCurrency(tweak: String = "amt") extends ScalarTransformer {
    private val c = FakerChoice(Currencies, tweak + "c")
    // integer-cents rendering: exact and engine-agnostic (no double formatting)
    def column(in: Column) = {
      val cents = Gen.longBetween(Gen.u60(in, tweak), 1, 999999)
      concat((cents / 100).cast("long").cast("string"), lit("."),
        lpad((cents % 100).cast("string"), 2, "0"), lit(" "), c.column(in))
    }
    def oracle(in: String) = Some {
      val cents = OracleGen.longBetween(OracleGen.u60(in, tweak), 1, 999999)
      s"(((${cents}) // 100)::VARCHAR || '.' || lpad(((${cents}) % 100)::VARCHAR, 2, '0') || ' ' || ${c.oracle(in).get})"
    }
  }
  def amountWithCurrency: ScalarTransformer = AmountWithCurrency()

  /** Name → registered faker transformer, the `random_faker.go` table analog. */
  val all: Map[String, ScalarTransformer] = Map(
    "RandomLatitude" -> latitude, "RandomLongitude" -> longitude,
    "RandomMonthName" -> monthName, "RandomYearString" -> yearString,
    "RandomDayOfWeek" -> dayOfWeek, "RandomDayOfMonth" -> dayOfMonth,
    "RandomCentury" -> century, "RandomTimezone" -> timezone,
    "RandomDomainName" -> domainName, "RandomURL" -> url,
    "RandomUsername" -> username, "RandomPassword" -> password,
    "RandomWord" -> word, "RandomSentence" -> sentence,
    "RandomParagraph" -> paragraph, "RandomCCType" -> ccType,
    "RandomCCNumber" -> ccNumber, "RandomCurrency" -> currency,
    "RandomAmountWithCurrency" -> amountWithCurrency,
    "RandomPhoneNumber" -> phoneNumber,
    "RandomTollFreePhoneNumber" -> tollFreePhoneNumber,
    "RandomE164PhoneNumber" -> e164PhoneNumber)
}

/** Multi-column transformers: RandomPerson / RandomCompany / RealAddress
  * (ref `random_person.go:25-87`, `random_company.go:18`,
  * `real_address.go:30-76`). One seed column drives every generated field
  * so fields stay mutually consistent per row; gender gates the first-name
  * dictionary exactly like the reference's gender mapping param. */
object MultiCol {
  import FakerData._

  /** (columnName -> expression) fan-out for a person; `seed` is the driving
    * input column (typically the row PK). */
  def person(seed: Column, tweak: String = "person"): Seq[(String, Column)] = {
    val isMale = Gen.u60(seed, tweak + "g") % 2 === 0
    val first = when(isMale,
      element_at(array(MaleFirst.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "f"), MaleFirst.size)))
      .otherwise(
        element_at(array(FemaleFirst.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "f"), FemaleFirst.size)))
    val last = element_at(array(LastNames.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "l"), LastNames.size))
    Seq(
      "gender" -> when(isMale, lit("M")).otherwise(lit("F")),
      "first_name" -> first,
      "last_name" -> last,
      "title" -> when(isMale, lit("Mr.")).otherwise(lit("Ms.")))
  }

  /** RandomPerson with gender read dynamically FROM A COLUMN of the row
    * (the reference's dynamic gender param + mapping,
    * `random_person.go:25-87`): `mapping` normalizes source values to
    * M/F; unmapped values fall back to the hashed gender. */
  def personWithGenderCol(seed: Column, genderCol: Column,
                          mapping: Map[String, String] = Map("M" -> "M", "F" -> "F"),
                          tweak: String = "person"): Seq[(String, Column)] = {
    val normalized = mapping.foldLeft(when(lit(false), lit(null))) {
      case (acc, (from, to)) => acc.when(genderCol === lit(from), lit(to))
    }.otherwise(when(Gen.u60(seed, tweak + "g") % 2 === 0, lit("M")).otherwise(lit("F")))
    val isMale = normalized === "M"
    val first = when(isMale,
      element_at(array(MaleFirst.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "f"), MaleFirst.size)))
      .otherwise(
        element_at(array(FemaleFirst.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "f"), FemaleFirst.size)))
    val last = element_at(array(LastNames.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "l"), LastNames.size))
    Seq(
      "gender" -> normalized,
      "first_name" -> first,
      "last_name" -> last,
      "title" -> when(isMale, lit("Mr.")).otherwise(lit("Ms.")))
  }

  def personSql(seed: String, tweak: String = "person"): Seq[(String, String)] = {
    def list(vs: Seq[String]) = vs.map(v => s"'$v'").mkString("[", ",", "]")
    val isMale = s"((${OracleGen.u60(seed, tweak + "g")}) % 2 = 0)"
    val first = s"CASE WHEN ${isMale} THEN ${list(MaleFirst)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "f"), MaleFirst.size)}] " +
      s"ELSE ${list(FemaleFirst)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "f"), FemaleFirst.size)}] END"
    val last = s"${list(LastNames)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "l"), LastNames.size)}]"
    Seq(
      "gender" -> s"CASE WHEN ${isMale} THEN 'M' ELSE 'F' END",
      "first_name" -> first,
      "last_name" -> last,
      "title" -> s"CASE WHEN ${isMale} THEN 'Mr.' ELSE 'Ms.' END")
  }

  def company(seed: Column, tweak: String = "co"): Seq[(String, Column)] = Seq(
    "company_name" -> element_at(array(CompanyStems.map(lit): _*),
      Gen.pick(Gen.u60(seed, tweak + "n"), CompanyStems.size)),
    "company_suffix" -> element_at(array(CompanySuffixes.map(lit): _*),
      Gen.pick(Gen.u60(seed, tweak + "s"), CompanySuffixes.size)))

  def companySql(seed: String, tweak: String = "co"): Seq[(String, String)] = {
    def list(vs: Seq[String]) = vs.map(v => s"'$v'").mkString("[", ",", "]")
    Seq(
      "company_name" -> s"${list(CompanyStems)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "n"), CompanyStems.size)}]",
      "company_suffix" -> s"${list(CompanySuffixes)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "s"), CompanySuffixes.size)}]")
  }

  /** RealAddress analog: the reference indexes an embedded US-address
    * dataset; we compose consistent fields from dictionaries (a broadcast
    * parquet would slot in identically at scale). */
  def address(seed: Column, tweak: String = "addr"): Seq[(String, Column)] = Seq(
    "address1" -> concat(
      Gen.longBetween(Gen.u60(seed, tweak + "n"), 1, 9999).cast("string"), lit(" "),
      element_at(array(Streets.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "st"), Streets.size))),
    "city" -> element_at(array(Cities.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "c"), Cities.size)),
    "state" -> element_at(array(States.map(lit): _*), Gen.pick(Gen.u60(seed, tweak + "s"), States.size)),
    "postal_code" -> lpad((Gen.u60(seed, tweak + "z") % 100000L).cast("string"), 5, "0"),
    "lat" -> Gen.doubleBetween(Gen.u60(seed, tweak + "lat"), 24.0, 49.0, 5),
    "lng" -> Gen.doubleBetween(Gen.u60(seed, tweak + "lng"), -125.0, -66.0, 5))

  def addressSql(seed: String, tweak: String = "addr"): Seq[(String, String)] = {
    def list(vs: Seq[String]) = vs.map(v => s"'$v'").mkString("[", ",", "]")
    Seq(
      "address1" -> (s"((${OracleGen.longBetween(OracleGen.u60(seed, tweak + "n"), 1, 9999)})::VARCHAR || ' ' || " +
        s"${list(Streets)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "st"), Streets.size)}])"),
      "city" -> s"${list(Cities)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "c"), Cities.size)}]",
      "state" -> s"${list(States)}[${OracleGen.pick(OracleGen.u60(seed, tweak + "s"), States.size)}]",
      "postal_code" -> s"lpad(((${OracleGen.u60(seed, tweak + "z")}) % 100000)::VARCHAR, 5, '0')",
      "lat" -> OracleGen.doubleBetween(OracleGen.u60(seed, tweak + "lat"), 24.0, 49.0, 5),
      "lng" -> OracleGen.doubleBetween(OracleGen.u60(seed, tweak + "lng"), -125.0, -66.0, 5))
  }

  /** Per-column templates over the generated attributes (ref
    * `random_person.go:64-67,249,313-316`, `real_address.go:46,96-113` —
    * each configured output column carries a template evaluated against
    * the per-row attribute draw). The go-template dialect is re-scoped to
    * Spark SQL, the same trade as TemplateExpr (SURVEY §2.7): a bare
    * identifier naming an attribute resolves to that attribute's
    * expression; everything else resolves against the row as usual, so a
    * template can mix attributes with real row columns. */
  def templated(attrs: Seq[(String, Column)],
                templates: Seq[(String, String)]): Seq[(String, Column)] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    // expr() defers SQL parsing to analysis time (SqlExpression node), so
    // parse eagerly to get a real tree to substitute into
    val parser = new org.apache.spark.sql.catalyst.parser.CatalystSqlParser()
    val attrExprs = attrs.map { case (n, c) => n.toLowerCase -> GraftBridge.expression(c) }.toMap
    templates.map { case (out, tpl) =>
      val substituted = parser.parseExpression(tpl).transformUp {
        case a: UnresolvedAttribute if a.nameParts.size == 1 &&
          attrExprs.contains(a.name.toLowerCase) => attrExprs(a.name.toLowerCase)
      }
      out -> GraftBridge.column(substituted)
    }
  }

  /** Oracle analog of [[templated]]: single-pass word-boundary textual
    * substitution of attribute names with their SQL expansions (one pass
    * so an expansion never gets re-substituted). SQL string literals
    * ('...', with '' escaping) are opaque spans — an attribute name inside
    * one is data, not a reference; the parser-based Spark path never
    * substitutes there, so neither may the oracle (round-4 advice).
    * Templates must stay in the dialect-neutral SQL subset for DuckDB
    * parity. */
  def templatedSql(attrsSql: Seq[(String, String)],
                   templates: Seq[(String, String)]): Seq[(String, String)] = {
    val bySql = attrsSql.map { case (n, s) => n.toLowerCase -> s }.toMap
    val re = ("(?i)\\b(" + attrsSql.map(n => java.util.regex.Pattern.quote(n._1))
      .mkString("|") + ")\\b").r
    val strLit = "'(?:[^']|'')*'".r
    def subst(seg: String): String = re.replaceAllIn(seg, m =>
      java.util.regex.Matcher.quoteReplacement("(" + bySql(m.group(1).toLowerCase) + ")"))
    templates.map { case (out, tpl) =>
      val sb = new StringBuilder
      var pos = 0
      strLit.findAllMatchIn(tpl).foreach { m =>
        sb.append(subst(tpl.substring(pos, m.start))).append(m.matched)
        pos = m.end
      }
      sb.append(subst(tpl.substring(pos)))
      out -> sb.toString
    }
  }
}

/** RandomPerson as a single-column transformer: the per-row person draw
  * (seeded by the input column) rendered through a column template —
  * the scalar face of the reference's `columns: [{name, template}]`
  * param (`random_person.go:62-67`). */
case class PersonTemplate(template: String, tweak: String = "person")
  extends ScalarTransformer {
  def column(in: Column) =
    MultiCol.templated(MultiCol.person(in, tweak), Seq("v" -> template)).head._2
  def oracle(in: String) = Some(
    MultiCol.templatedSql(MultiCol.personSql(in, tweak), Seq("v" -> template)).head._2)
}

/** RealAddress with the reference's required per-column template
  * (`real_address.go:46,96-113`): attributes address1/city/state/
  * postal_code/lat/lng. lat/lng are numeric — a template using them must
  * cast for string concat, exactly like the reference's FormatFloat. */
case class AddressTemplate(template: String, tweak: String = "addr")
  extends ScalarTransformer {
  def column(in: Column) =
    MultiCol.templated(MultiCol.address(in, tweak), Seq("v" -> template)).head._2
  def oracle(in: String) = Some(
    MultiCol.templatedSql(MultiCol.addressSql(in, tweak), Seq("v" -> template)).head._2)
}

/** RandomCompany through a column template (attributes company_name /
  * company_suffix). */
case class CompanyTemplate(template: String, tweak: String = "co")
  extends ScalarTransformer {
  def column(in: Column) =
    MultiCol.templated(MultiCol.company(in, tweak), Seq("v" -> template)).head._2
  def oracle(in: String) = Some(
    MultiCol.templatedSql(MultiCol.companySql(in, tweak), Seq("v" -> template)).head._2)
}
