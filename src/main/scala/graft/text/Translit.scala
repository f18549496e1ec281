package graft.text

/**
 * CJK-to-latin transliteration from public, fully-specified sources —
 * the piece of the reference's ICU `any-latin` path
 * (`util/ThreadLocalTransliterator.java`) that is algorithmic or
 * compact enough to carry without ICU data files:
 *
 *  - Hangul: exact. Every precomposed syllable (U+AC00..U+D7A3)
 *    decomposes arithmetically into (lead, vowel, tail) jamo — the
 *    Unicode 3.12 "Hangul Syllable Decomposition" formula — and each
 *    jamo maps through the Revised Romanization of Korean (2000)
 *    tables. Compatibility jamo (U+3131..) map through the same
 *    tables.
 *  - Kana: exact. Hiragana (U+3041..U+3096) and katakana
 *    (U+30A1..U+30FA) romanize by the Hepburn tables, including yoon
 *    digraphs (kya/sho/...), sokuon gemination, and the katakana
 *    long-vowel mark.
 *  - Han: a compact high-frequency subset (numerals, directions,
 *    geo/administrative morphemes, province and major-city name
 *    characters) with standard pinyin readings (tone marks omitted,
 *    space-separated, matching ICU Han-Latin's word shape). Characters
 *    outside the subset pass through unchanged — callers detect the
 *    leftover non-latin and fall back, rather than receiving wrong
 *    readings. This is honestly partial: full Unihan coverage needs
 *    the Unihan database, which the zero-egress sandbox cannot fetch.
 *
 * All tables are pure constants; the functions are pure and
 * executor-safe.
 */
object Translit {

  // ---------------------------------------------------------- Hangul

  // Revised Romanization (2000): initial consonants, medial vowels,
  // and final consonants (final forms: k/t/p for the stops).
  private val HangulLeads = Array(
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s",
    "ss", "", "j", "jj", "ch", "k", "t", "p", "h")
  private val HangulVowels = Array(
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa",
    "wae", "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i")
  private val HangulTails = Array(
    "", "k", "k", "ks", "n", "nj", "nh", "t", "l", "lk",
    "lm", "lp", "ls", "lt", "lp", "lh", "m", "p", "ps", "t",
    "t", "ng", "t", "t", "k", "t", "p", "h")

  private final val SBase = 0xAC00
  private final val SCount = 11172

  // Compatibility jamo (U+3131..U+3163): standalone consonants romanize
  // by their initial (lead) form, vowels by the medial table — same RR
  // tables as precomposed syllables, laid out in compatibility order.
  private val CompatConsonants = Array(
    "g", "kk", "gs", "n", "nj", "nh", "d", "tt", "r", "lg",
    "lm", "lb", "ls", "lt", "lp", "lh", "m", "b", "pp", "bs",
    "s", "ss", "ng", "j", "jj", "ch", "k", "t", "p", "h")

  /** Romanize one compatibility jamo (U+3131..U+3163), or null. */
  def compatJamo(cp: Int): String =
    if (cp >= 0x3131 && cp <= 0x314E) CompatConsonants(cp - 0x3131)
    else if (cp >= 0x314F && cp <= 0x3163) HangulVowels(cp - 0x314F)
    else null

  /** Romanize one precomposed Hangul syllable, or null if `cp` is not
    * one. Unicode decomposition: s = cp - AC00; lead = s/588,
    * vowel = (s%588)/28, tail = s%28. */
  def hangulSyllable(cp: Int): String = {
    val s = cp - SBase
    if (s < 0 || s >= SCount) null
    else HangulLeads(s / 588) + HangulVowels(s % 588 / 28) + HangulTails(s % 28)
  }

  // ------------------------------------------------------------ Kana

  // Hepburn romanization of the gojuon + voiced/handakuten rows,
  // indexed by offset from the hiragana block start (U+3041). The
  // katakana block (U+30A1..) shares the layout shifted by 0x60.
  // Small ya/yu/yo (offsets 0x62,0x64,0x66 from 3041 => ゃゅょ) combine
  // with a preceding i-row syllable into the yoon digraph.
  private val Kana: Map[Char, String] = {
    val h = Map(
      'ぁ' -> "a", 'あ' -> "a", 'ぃ' -> "i", 'い' -> "i", 'ぅ' -> "u", 'う' -> "u",
      'ぇ' -> "e", 'え' -> "e", 'ぉ' -> "o", 'お' -> "o",
      'か' -> "ka", 'が' -> "ga", 'き' -> "ki", 'ぎ' -> "gi", 'く' -> "ku", 'ぐ' -> "gu",
      'け' -> "ke", 'げ' -> "ge", 'こ' -> "ko", 'ご' -> "go",
      'さ' -> "sa", 'ざ' -> "za", 'し' -> "shi", 'じ' -> "ji", 'す' -> "su", 'ず' -> "zu",
      'せ' -> "se", 'ぜ' -> "ze", 'そ' -> "so", 'ぞ' -> "zo",
      'た' -> "ta", 'だ' -> "da", 'ち' -> "chi", 'ぢ' -> "ji", 'つ' -> "tsu", 'づ' -> "zu",
      'て' -> "te", 'で' -> "de", 'と' -> "to", 'ど' -> "do",
      'な' -> "na", 'に' -> "ni", 'ぬ' -> "nu", 'ね' -> "ne", 'の' -> "no",
      'は' -> "ha", 'ば' -> "ba", 'ぱ' -> "pa", 'ひ' -> "hi", 'び' -> "bi", 'ぴ' -> "pi",
      'ふ' -> "fu", 'ぶ' -> "bu", 'ぷ' -> "pu", 'へ' -> "he", 'べ' -> "be", 'ぺ' -> "pe",
      'ほ' -> "ho", 'ぼ' -> "bo", 'ぽ' -> "po",
      'ま' -> "ma", 'み' -> "mi", 'む' -> "mu", 'め' -> "me", 'も' -> "mo",
      'や' -> "ya", 'ゆ' -> "yu", 'よ' -> "yo",
      'ら' -> "ra", 'り' -> "ri", 'る' -> "ru", 'れ' -> "re", 'ろ' -> "ro",
      'ゎ' -> "wa", 'わ' -> "wa", 'ゐ' -> "wi", 'ゑ' -> "we", 'を' -> "o", 'ん' -> "n",
      // standalone small ya/yu/yo (the yoon digraph path consumes them
      // after an i-row syllable before this map is consulted)
      'ゃ' -> "ya", 'ゅ' -> "yu", 'ょ' -> "yo",
      'ゔ' -> "vu", 'ゕ' -> "ka", 'ゖ' -> "ke")
    // project the hiragana table onto katakana (fixed +0x60 offset),
    // then the katakana-only characters: the v-row ヷヸヹヺ and the
    // place-name counter ヶ, which reads "ga" in the compounds that
    // dominate map labels (市ヶ谷 Ichigaya, 霞ヶ関 Kasumigaseki)
    h ++ h.map { case (c, r) => ((c + 0x60).toChar, r) } ++
      Map('ヷ' -> "va", 'ヸ' -> "vi", 'ヹ' -> "ve", 'ヺ' -> "vo", 'ヶ' -> "ga")
  }
  private def isSmallYaYuYo(c: Char): Boolean =
    c == 'ゃ' || c == 'ゅ' || c == 'ょ' || c == 'ャ' || c == 'ュ' || c == 'ョ'
  private def smallVowel(c: Char): String = c match {
    case 'ゃ' | 'ャ' => "a"
    case 'ゅ' | 'ュ' => "u"
    case _ => "o"
  }
  private def isSokuon(c: Char): Boolean = c == 'っ' || c == 'ッ'
  private def isSmallVowel(c: Char): Boolean =
    "ぁぃぅぇぉァィゥェォ".indexOf(c) >= 0
  private def smallVowelOf(c: Char): String = "ぁぃぅぇぉァィゥェォ".indexOf(c) match {
    case 0 | 5 => "a"; case 1 | 6 => "i"; case 2 | 7 => "u"
    case 3 | 8 => "e"; case _ => "o"
  }
  private def isKanaChar(c: Char): Boolean =
    (c >= 0x3041 && c <= 0x3096) || (c >= 0x30A1 && c <= 0x30FA) || c == 'ー'

  /** Romanize a maximal kana run starting at `i`; returns (romaji,
    * next index). Handles yoon digraphs (きゃ -> kya), sokuon
    * gemination (さっぽろ -> sapporo), ん, and the long-vowel mark
    * (repeats the previous vowel). */
  private def kanaRun(s: String, start: Int, sb: java.lang.StringBuilder): Int = {
    var i = start
    var geminate = false
    while (i < s.length && isKanaChar(s.charAt(i))) {
      val c = s.charAt(i)
      if (isSokuon(c)) { geminate = true; i += 1 }
      else if (c == 'ー') {
        // katakana long vowel: repeat the last emitted vowel
        val last = if (sb.length > 0) sb.charAt(sb.length - 1) else ' '
        if ("aeiou".indexOf(last) >= 0) sb.append(last)
        i += 1
      } else {
        // pass unknown kana through (the documented contract for every
        // script here) rather than silently deleting the character
        var syl = Kana.getOrElse(c, c.toString)
        var step = 1
        if (i + 1 < s.length && isSmallYaYuYo(s.charAt(i + 1)) && syl.endsWith("i")) {
          val stem = syl.substring(0, syl.length - 1)
          // shi+small -> sha/shu/sho, chi -> cha..., ji -> ja...
          syl = (if (stem == "sh" || stem == "ch" || stem == "j") stem
                 else stem + "y") + smallVowel(s.charAt(i + 1))
          step = 2
        } else if (i + 1 < s.length && isSmallVowel(s.charAt(i + 1)) &&
                   syl.endsWith("u")) {
          // loanword contraction: u-row + small vowel (ヴァ -> va,
          // ファ -> fa); the bare vowel ウ contracts on a 'w' stem
          // (ウィ -> wi, ウェ -> we, ウォ -> wo — Hepburn loanword forms)
          val stem = if (syl.length == 1) "w" else syl.substring(0, syl.length - 1)
          syl = stem + smallVowelOf(s.charAt(i + 1))
          step = 2
        }
        if (geminate && syl.nonEmpty) {
          // Hepburn doubles the consonant; っち -> tchi
          sb.append(if (syl.startsWith("ch")) 't' else syl.charAt(0))
          geminate = false
        }
        sb.append(syl)
        i += step
      }
    }
    i
  }

  // ------------------------------------------------------------- Han

  /**
   * High-frequency Han characters with standard (most common) pinyin
   * readings, tone marks omitted — numerals, directions, the
   * geographic/administrative morphemes that dominate CJK place
   * names, and the characters of province/major-city names. ~230
   * characters; anything else passes through for the caller's
   * latin-filter to reject.
   */
  private val HanPinyin: Map[Char, String] = Map(
    // numerals + common
    '一' -> "yi", '二' -> "er", '三' -> "san", '四' -> "si", '五' -> "wu",
    '六' -> "liu", '七' -> "qi", '八' -> "ba", '九' -> "jiu", '十' -> "shi",
    '百' -> "bai", '千' -> "qian", '万' -> "wan",
    // directions / relative
    '东' -> "dong", '東' -> "dong", '西' -> "xi", '南' -> "nan", '北' -> "bei",
    '中' -> "zhong", '上' -> "shang", '下' -> "xia", '内' -> "nei", '外' -> "wai",
    '前' -> "qian", '后' -> "hou", '左' -> "zuo", '右' -> "you",
    // size / age / quality
    '大' -> "da", '小' -> "xiao", '新' -> "xin", '旧' -> "jiu", '老' -> "lao",
    '高' -> "gao", '长' -> "chang", '長' -> "chang", '平' -> "ping", '永' -> "yong",
    '金' -> "jin", '银' -> "yin", '红' -> "hong", '白' -> "bai", '黑' -> "hei",
    '青' -> "qing", '黄' -> "huang", '绿' -> "lv", '光' -> "guang", '明' -> "ming",
    // geography
    '山' -> "shan", '河' -> "he", '江' -> "jiang", '湖' -> "hu", '海' -> "hai",
    '川' -> "chuan", '水' -> "shui", '泉' -> "quan", '溪' -> "xi", '滩' -> "tan",
    '岛' -> "dao", '島' -> "dao", '湾' -> "wan", '灣' -> "wan", '港' -> "gang",
    '岸' -> "an", '峰' -> "feng", '岭' -> "ling", '谷' -> "gu", '坡' -> "po",
    '原' -> "yuan", '野' -> "ye", '林' -> "lin", '森' -> "sen", '田' -> "tian",
    '石' -> "shi", '沙' -> "sha", '池' -> "chi", '塘' -> "tang", '井' -> "jing",
    '泽' -> "ze", '洲' -> "zhou", '洋' -> "yang", '沟' -> "gou", '坝' -> "ba",
    // administrative / settlement
    '国' -> "guo", '國' -> "guo", '省' -> "sheng", '市' -> "shi", '县' -> "xian",
    '縣' -> "xian", '区' -> "qu", '區' -> "qu", '州' -> "zhou", '府' -> "fu",
    '城' -> "cheng", '村' -> "cun", '镇' -> "zhen", '鎮' -> "zhen", '乡' -> "xiang",
    '鄉' -> "xiang", '都' -> "du", '京' -> "jing", '郡' -> "jun", '庄' -> "zhuang",
    '家' -> "jia", '屯' -> "tun", '营' -> "ying", '寨' -> "zhai", '堡' -> "bao",
    // infrastructure
    '路' -> "lu", '街' -> "jie", '道' -> "dao", '桥' -> "qiao", '橋' -> "qiao",
    '门' -> "men", '門' -> "men", '站' -> "zhan", '场' -> "chang", '場' -> "chang",
    '园' -> "yuan", '園' -> "yuan", '馆' -> "guan", '楼' -> "lou", '塔' -> "ta",
    '寺' -> "si", '庙' -> "miao", '宫' -> "gong", '宮' -> "gong", '院' -> "yuan",
    '学' -> "xue", '學' -> "xue", '校' -> "xiao", '医' -> "yi", '公' -> "gong",
    '广' -> "guang", '廣' -> "guang", '厂' -> "chang", '台' -> "tai", '臺' -> "tai",
    '机' -> "ji", '铁' -> "tie", '火' -> "huo", '车' -> "che", '車' -> "che",
    '头' -> "tou", '頭' -> "tou", '口' -> "kou", '角' -> "jiao", '边' -> "bian",
    // province / major city characters
    '京' -> "jing", '津' -> "jin", '冀' -> "ji", '晋' -> "jin", '蒙' -> "meng",
    '辽' -> "liao", '遼' -> "liao", '吉' -> "ji", '龙' -> "long", '龍' -> "long",
    '苏' -> "su", '蘇' -> "su", '浙' -> "zhe", '皖' -> "wan", '闽' -> "min",
    '赣' -> "gan", '鲁' -> "lu", '豫' -> "yu", '鄂' -> "e", '湘' -> "xiang",
    '粤' -> "yue", '桂' -> "gui", '琼' -> "qiong", '渝' -> "yu", '蜀' -> "shu",
    '黔' -> "qian", '滇' -> "dian", '藏' -> "zang", '陕' -> "shan", '陝' -> "shan",
    '甘' -> "gan", '宁' -> "ning", '寧' -> "ning", '疆' -> "jiang",
    '河' -> "he", '北' -> "bei", '天' -> "tian", '安' -> "an", '徽' -> "hui",
    '福' -> "fu", '建' -> "jian", '贵' -> "gui", '貴' -> "gui", '云' -> "yun",
    '雲' -> "yun", '四' -> "si", '重' -> "chong", '庆' -> "qing", '慶' -> "qing",
    '武' -> "wu", '汉' -> "han", '漢' -> "han", '深' -> "shen", '圳' -> "zhen",
    '杭' -> "hang", '成' -> "cheng", '沈' -> "shen", '阳' -> "yang", '陽' -> "yang",
    '郑' -> "zheng", '鄭' -> "zheng", '济' -> "ji", '濟' -> "ji", '青' -> "qing",
    '厦' -> "xia", '廈' -> "xia", '兰' -> "lan", '蘭' -> "lan", '昆' -> "kun",
    '拉' -> "la", '萨' -> "sa", '薩' -> "sa", '乌' -> "wu", '烏' -> "wu",
    '鲁' -> "lu", '魯' -> "lu", '木' -> "mu", '齐' -> "qi", '齊' -> "qi",
    '哈' -> "ha", '尔' -> "er", '爾' -> "er", '滨' -> "bin", '濱' -> "bin",
    '春' -> "chun", '石' -> "shi", '太' -> "tai", '呼' -> "hu", '和' -> "he",
    '浩' -> "hao", '特' -> "te", '合' -> "he", '肥' -> "fei", '昌' -> "chang",
    '沙' -> "sha", '香' -> "xiang", '澳' -> "ao", '澳' -> "ao", '华' -> "hua",
    '華' -> "hua", '人' -> "ren", '民' -> "min", '共' -> "gong", '土' -> "tu",
    '地' -> "di", '风' -> "feng", '風' -> "feng", '花' -> "hua", '草' -> "cao",
    '竹' -> "zhu", '松' -> "song", '梅' -> "mei", '玉' -> "yu", '宝' -> "bao",
    '寶' -> "bao", '兴' -> "xing", '興' -> "xing", '顺' -> "shun", '順' -> "shun",
    '德' -> "de", '义' -> "yi", '義' -> "yi", '文' -> "wen", '星' -> "xing",
    '月' -> "yue", '日' -> "ri", '丰' -> "feng", '豐' -> "feng", '富' -> "fu",
    '贝' -> "bei", '貝' -> "bei", '双' -> "shuang", '雙' -> "shuang",
    '三' -> "san", '王' -> "wang", '李' -> "li", '张' -> "zhang", '張' -> "zhang",
    '刘' -> "liu", '劉' -> "liu", '陈' -> "chen", '陳' -> "chen", '杨' -> "yang",
    '楊' -> "yang", '赵' -> "zhao", '趙' -> "zhao", '周' -> "zhou", '吴' -> "wu",
    '吳' -> "wu", '徐' -> "xu", '孙' -> "sun", '孫' -> "sun", '马' -> "ma",
    '馬' -> "ma", '朱' -> "zhu", '胡' -> "hu", '郭' -> "guo", '何' -> "he",
    '高' -> "gao", '罗' -> "luo", '羅' -> "luo", '郑' -> "zheng", '梁' -> "liang")

  def hanReading(c: Char): String = HanPinyin.getOrElse(c, null)

  // --------------------------------------------------------- driver

  private def isHangul(cp: Int): Boolean =
    (cp >= SBase && cp < SBase + SCount) ||
      (cp >= 0x1100 && cp <= 0x11FF) || (cp >= 0x3130 && cp <= 0x318F)
  private def isHan(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)

  /** True if `transliterateCjk` has a rule for this char (used by the
    * generic transliterator to decide routing). */
  def handles(c: Char): Boolean =
    isKanaChar(c) || isHangul(c) || (isHan(c) && HanPinyin.contains(c))

  /**
   * Transliterate the CJK content of `s`: Hangul and kana runs become
   * concatenated romanized words; known Han characters become
   * space-separated pinyin syllables (ICU Han-Latin's word shape).
   * Characters with no rule (including Han outside the subset) pass
   * through unchanged. Pure per-char/run string processing — safe in
   * tight executor loops.
   */
  def transliterateCjk(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length * 2)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isKanaChar(c)) i = kanaRun(s, i, sb)
      else if (isHangul(c)) {
        // concatenate syllables within one Hangul run (서울 -> seoul)
        while (i < s.length && isHangul(s.charAt(i))) {
          val cp = s.charAt(i).toInt
          val r = hangulSyllable(cp)
          val r2 = if (r != null) r else compatJamo(cp)
          if (r2 != null) sb.append(r2) else sb.append(s.charAt(i))
          i += 1
        }
      } else if (isHan(c) && HanPinyin.contains(c)) {
        // space-separated syllables; spaces collapse at the edges
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
        sb.append(HanPinyin(c))
        val more = i + 1 < s.length && HanPinyin.contains(s.charAt(i + 1))
        if (!more && i + 1 < s.length && s.charAt(i + 1) != ' ') sb.append(' ')
        i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString.trim
  }
}
